#!/usr/bin/env python
"""Correctness + timing check of the staged sort-based MSM on the live
backend: 2^14 and optionally 2^20 (cached points), vs host golden."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from aztec_tpu.utils import setup_compile_cache
setup_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from aztec_tpu.curves.spec import BN254_G1
from aztec_tpu.curves import golden
from aztec_tpu.curves.io import jacobian_to_host
from aztec_tpu.msm.pippenger import msm
from aztec_tpu.numeric.bigint import ints_to_limbs
from aztec_tpu.ff.bn254 import FR_MOD

print("device:", jax.devices()[0], flush=True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
d = np.load(os.path.join(REPO, ".bench_cache", "points_2pow20.npz"))

sizes = [int(s) for s in os.environ.get("CHECK_SIZES", "14,20").split(",")]

# tau powers for golden expectation
tau = 0xB0B0CAFE12345678DEADBEEF
nmax = 1 << max(sizes)
taus = [1]
for _ in range(nmax - 1):
    taus.append(taus[-1] * tau % FR_MOD)

rng = np.random.default_rng(7)
scal_ints = [int.from_bytes(rng.bytes(32), "little") % FR_MOD
             for _ in range(nmax)]
scal_limbs = ints_to_limbs(scal_ints)

for log2n in sizes:
    n = 1 << log2n
    X = jnp.asarray(d["X"][:, :n].astype(np.uint32))
    Y = jnp.asarray(d["Y"][:, :n].astype(np.uint32))
    scalars = jnp.asarray(scal_limbs[:, :n])

    t0 = time.perf_counter()
    r = msm((X, Y), scalars, BN254_G1)
    r[0].block_until_ready()
    t1 = time.perf_counter()
    print(f"2^{log2n} warmup (compile+run): {t1-t0:.1f}s", flush=True)

    if log2n <= 14:
        kk = sum(s * t for s, t in zip(scal_ints[:n], taus[:n])) % \
            BN254_G1.order
        expect = golden.GoldenCurve(BN254_G1).mul(
            kk, (BN254_G1.gen_x, BN254_G1.gen_y))
        got = jacobian_to_host(r, BN254_G1)[0]
        print(f"2^{log2n} correctness:",
              "OK" if got == expect else f"MISMATCH {got} != {expect}",
              flush=True)

    iters = 4
    t1 = time.perf_counter()
    for it in range(iters):
        tweak = (r[0][0, 0] & jnp.uint32(1)) + jnp.uint32(it)
        sc2 = scalars.at[0, 0].set(scalars[0, 0] ^ tweak)
        r = msm((X, Y), sc2, BN254_G1)
    r[0].block_until_ready()
    dt = (time.perf_counter() - t1) / iters
    print(f"2^{log2n}: {dt*1e3:.1f} ms -> {n/dt:.3e} pts/s "
          f"(vs 3.0e6: {n/dt/3e6:.2f}x)", flush=True)
