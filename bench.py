#!/usr/bin/env python
"""Headline benchmark: Pippenger MSM throughput at 2^20 points (BN254 G1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The MSM is the reference's #1 prover hot spot (SURVEY.md §2, scalar_
multiplication.cpp): a 1M-gate proof runs ~9 MSMs of 2^20.  vs_baseline is
points/s relative to the analytical reference throughput of multithreaded
barretenberg on a contemporary CPU host (~2^20 points in ~0.35 s ≈ 3.0e6
points/s; derived from the in-repo complexity analysis 2^24 point-adds/MSM at
~6 field muls per add on all cores — no published numbers exist, see
BASELINE.md).
"""

import json
import os
import sys
import time

N_POINTS = int(os.environ.get("BENCH_MSM_N", 1 << 20))
BASELINE_POINTS_PER_S = 3.0e6

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np
    import jax

    from aztec_tpu.utils import setup_compile_cache

    setup_compile_cache()

    from aztec_tpu.curves.spec import BN254_G1
    from aztec_tpu.curves.fixed_base import fixed_base_mul
    from aztec_tpu.curves import group
    from aztec_tpu.msm.pippenger import msm
    from aztec_tpu.numeric.bigint import ints_to_limbs
    from aztec_tpu.ff.bn254 import FR_MOD

    n = N_POINTS
    rng = np.random.default_rng(7)

    # synthesize an SRS-like point set on device: tau^i * G
    tau = 0xB0B0CAFE12345678DEADBEEF
    taus = [1]
    for _ in range(n - 1):
        taus.append(taus[-1] * tau % FR_MOD)
    sc_tbl = jax.numpy.asarray(ints_to_limbs(taus))
    P = fixed_base_mul(sc_tbl, BN254_G1)
    X, Y, inf = group.to_affine(P, BN254_G1.field)
    X.block_until_ready()

    scalars = ints_to_limbs(
        [int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(n)]
    )
    scalars = jax.numpy.asarray(scalars)

    # warm-up (compile)
    r = msm((X, Y), scalars, BN254_G1)
    r[0].block_until_ready()

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        r = msm((X, Y), scalars, BN254_G1)
        r[0].block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    pps = n / dt
    print(
        json.dumps(
            {
                "metric": f"msm_bn254_2pow{n.bit_length()-1}_points_per_s",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / BASELINE_POINTS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
