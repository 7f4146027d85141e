"""End-to-end msm() wall-clock on synthetic planes (timing only).

Every kernel in the MSM is branchless/data-independent, so random sub-16-bit
planes time identically to real SRS points (same guarantee as
scripts/msm_dissect.py).  Correctness is covered by tests/test_msm.py.

    python scripts/msm_time.py [log2n ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aztec_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aztec_tpu.curves.spec import BN254_G1  # noqa: E402
from aztec_tpu.msm import msm  # noqa: E402
from aztec_tpu.numeric.bigint import ints_to_limbs  # noqa: E402
from aztec_tpu.ff.bn254 import FR_MOD  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [20]
    print(f"backend={jax.devices()[0]}", flush=True)
    for log2n in sizes:
        n = 1 << log2n
        rngp = np.random.default_rng(3)
        X = jnp.asarray(rngp.integers(0, 1 << 16, (16, n), dtype=np.uint32))
        Y = jnp.asarray(rngp.integers(0, 1 << 16, (16, n), dtype=np.uint32))
        rng = np.random.default_rng(5)
        scal = jnp.asarray(ints_to_limbs(
            [int.from_bytes(rng.bytes(32), "little") % FR_MOD
             for _ in range(n)]))
        t0 = time.time()
        r = msm((X, Y), scal, BN254_G1)
        jax.block_until_ready(r)
        comp = time.time() - t0
        # dependency-chain iterations: the axon tunnel memoizes identical
        # (executable, args) executions, so same-args timing loops read ~0
        # (measured round 3); xor-ing a result byte into the scalars forces
        # a fresh execution every iteration at negligible cost.
        iters = 4
        t0 = time.time()
        for _ in range(iters):
            tweak = (r[0][0, 0] & jnp.uint32(1)).astype(jnp.uint32)
            scal2 = scal.at[0, 0].set(scal[0, 0] ^ tweak)
            r = msm((X, Y), scal2, BN254_G1)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / iters
        print(f"2^{log2n}: {dt*1e3:9.1f} ms/MSM  {n/dt:.3e} points/s  "
              f"(first-call {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
