#!/usr/bin/env python
"""TPU smoke for the chunked MSM: golden-checked 2^14, then timed sizes.

Usage: python tools/chunked_smoke.py [log2 sizes...]  (default: 14 17 20)
Relies on .bench_cache/points_2pow20.npz (scripts/gen_points.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aztec_tpu.utils import setup_compile_cache
setup_compile_cache()

import jax
import jax.numpy as jnp

from aztec_tpu.curves.spec import BN254_G1
from aztec_tpu.curves import golden
from aztec_tpu.curves.io import jacobian_to_host
from aztec_tpu.msm.pippenger import msm
from aztec_tpu.numeric.bigint import ints_to_limbs
from aztec_tpu.ff.bn254 import FR_MOD

print(f"backend: {jax.default_backend()}", flush=True)

SIZES = [int(a) for a in sys.argv[1:]] or [14, 17, 20]
nmax = 1 << max(SIZES)

d = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache", "points_2pow20.npz"))
X20 = d["X"].astype(np.uint32)
Y20 = d["Y"].astype(np.uint32)

rng = np.random.default_rng(7)
tau = 0xB0B0CAFE12345678DEADBEEF
taus = [1]
for _ in range(nmax - 1):
    taus.append(taus[-1] * tau % FR_MOD)
scal_ints = [int.from_bytes(rng.bytes(32), "little") % FR_MOD
             for _ in range(nmax)]
scal_limbs = ints_to_limbs(scal_ints)
print("host setup done", flush=True)

for log2n in SIZES:
    n = 1 << log2n
    X = jnp.asarray(X20[:, :n])
    Y = jnp.asarray(Y20[:, :n])
    scalars = jnp.asarray(scal_limbs[:, :n])
    t0 = time.perf_counter()
    r = msm((X, Y), scalars, BN254_G1)
    r[0].block_until_ready()
    t_cold = time.perf_counter() - t0
    print(f"2^{log2n} cold: {t_cold:.1f}s", flush=True)

    if log2n <= 14:
        kk = sum(s * t for s, t in zip(scal_ints[:n], taus[:n])) \
            % BN254_G1.order
        expect = golden.GoldenCurve(BN254_G1).mul(
            kk, (BN254_G1.gen_x, BN254_G1.gen_y))
        got = jacobian_to_host(r, BN254_G1)[0]
        assert got == expect, f"2^{log2n} MISMATCH"
        print(f"2^{log2n} correctness OK", flush=True)

    iters = 3
    t1 = time.perf_counter()
    for it in range(iters):
        sc2 = jnp.roll(scalars, it + 1, axis=1)  # fresh values everywhere
        r = msm((X, Y), sc2, BN254_G1)
    r[0].block_until_ready()
    dt = (time.perf_counter() - t1) / iters
    print(f"2^{log2n} warm: {dt*1e3:.1f} ms -> {n/dt:.3e} points/s "
          f"(vs 3.0e6 baseline: {n/dt/3.0e6:.2f}x)", flush=True)
