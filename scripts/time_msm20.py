#!/usr/bin/env python
"""Quick wall-clock of the 2^20 MSM on the live backend using the cached
point table (.bench_cache/points_2pow20.npz).  Prints compile + per-iter
times and a phase-level breakdown hook via env MSM_LOG2 (default 20)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from aztec_tpu.utils import setup_compile_cache
setup_compile_cache()

from aztec_tpu.curves.spec import BN254_G1
from aztec_tpu.msm.pippenger import msm, default_config
from aztec_tpu.numeric.bigint import ints_to_limbs
from aztec_tpu.ff.bn254 import FR_MOD

LOG2 = int(os.environ.get("MSM_LOG2", "20"))
n = 1 << LOG2
d = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache", "points_2pow20.npz"))
X = jnp.asarray(d["X"][:, :n].astype(np.uint32))
Y = jnp.asarray(d["Y"][:, :n].astype(np.uint32))

rng = np.random.default_rng(7)
scal_ints = [int.from_bytes(rng.bytes(32), "little") % FR_MOD
             for _ in range(n)]
scalars = jnp.asarray(ints_to_limbs(scal_ints))

cfg = default_config(n)
print(f"n=2^{LOG2} config={cfg} backend={jax.devices()[0].platform}",
      flush=True)

t0 = time.perf_counter()
r = msm((X, Y), scalars, BN254_G1)
r[0].block_until_ready()
t1 = time.perf_counter()
print(f"warmup (compile+run): {t1 - t0:.2f}s", flush=True)

iters = 3
t1 = time.perf_counter()
for it in range(iters):
    tweak = (r[0][0, 0] & jnp.uint32(1)) + jnp.uint32(it)
    sc2 = scalars.at[0, 0].set(scalars[0, 0] ^ tweak)
    r = msm((X, Y), sc2, BN254_G1)
r[0].block_until_ready()
dt = (time.perf_counter() - t1) / iters
print(f"per-iter: {dt*1e3:.1f} ms  -> {n/dt:.3e} points/s "
      f"(vs 3.0e6 baseline: {n/dt/3.0e6:.2f}x)", flush=True)
