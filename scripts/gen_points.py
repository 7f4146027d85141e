#!/usr/bin/env python
"""Generate + cache the bench SRS-like point table (tau^i * G) up to 2^20.

Chunked (2^16 per fixed_base_mul call, shape-stable) and resumable: chunk
files persist until the final .npz is assembled.  Run standalone so bench.py
never spends its budget on table generation.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aztec_tpu.utils import setup_compile_cache
setup_compile_cache()

import jax.numpy as jnp

from aztec_tpu.curves.spec import BN254_G1
from aztec_tpu.curves.fixed_base import fixed_base_mul
from aztec_tpu.curves import group
from aztec_tpu.numeric.bigint import ints_to_limbs
from aztec_tpu.ff.bn254 import FR_MOD

LOG2 = int(os.environ.get("GEN_LOG2", "20"))
CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")
os.makedirs(CACHE_DIR, exist_ok=True)

n = 1 << LOG2
f = os.path.join(CACHE_DIR, f"points_2pow{LOG2}.npz")
if os.path.exists(f):
    print("already cached", flush=True)
    sys.exit(0)

tau = 0xB0B0CAFE12345678DEADBEEF
t0 = time.time()
taus = [1]
for _ in range(n - 1):
    taus.append(taus[-1] * tau % FR_MOD)
tau_limbs = ints_to_limbs(taus)
print(f"host tau powers: {time.time()-t0:.0f}s", flush=True)

chunk = min(n, 1 << 16)
xs, ys = [], []
for base in range(0, n, chunk):
    cf = os.path.join(CACHE_DIR, f"chunk_{chunk}_{base}.npz")
    if os.path.exists(cf):
        d = np.load(cf)
        xs.append(d["X"]); ys.append(d["Y"])
        continue
    t0 = time.time()
    sc_tbl = jnp.asarray(tau_limbs[:, base:base + chunk])
    P = fixed_base_mul(sc_tbl, BN254_G1)
    Xc, Yc, inf = group.to_affine(P, BN254_G1.field)
    Xc, Yc, inf = np.asarray(Xc), np.asarray(Yc), np.asarray(inf)
    # guard the persistent cache all later benches trust (ADVICE r4 low):
    # limbs must genuinely be 16-bit and tau^i * G is never infinity
    assert (Xc < (1 << 16)).all() and (Yc < (1 << 16)).all(), "limb overflow"
    assert not inf.any(), "unexpected infinity in SRS table"
    xs.append(Xc.astype(np.uint16))
    ys.append(Yc.astype(np.uint16))
    np.savez(cf, X=xs[-1], Y=ys[-1])
    print(f"chunk {base + chunk}/{n}: {time.time()-t0:.0f}s", flush=True)
Xall = np.concatenate(xs, axis=1)
Yall = np.concatenate(ys, axis=1)
np.savez(f, X=Xall, Y=Yall)
for base in range(0, n, chunk):
    cf = os.path.join(CACHE_DIR, f"chunk_{chunk}_{base}.npz")
    if os.path.exists(cf):
        os.remove(cf)
print("done", flush=True)
