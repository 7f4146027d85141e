#!/usr/bin/env python
"""Definitive phase timing: N DISTINCT pre-staged inputs, one timed pass.

The axon tunnel memoizes (executable, argument-content) pairs, so any
same-args or value-cycling loop reads ~0.  Here every iteration consumes a
different pre-staged on-device input, so each dispatch does real work;
linearity is checked by also timing half the inputs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from aztec_tpu.utils import setup_compile_cache
setup_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)
NIN = int(os.environ.get("PROBE_NIN", "6"))


def bench(label, fn, inputs):
    """inputs: list of NIN argument-tuples, all pre-staged on device."""
    r = fn(*inputs[0])
    jax.block_until_ready(r)
    # half pass
    t0 = time.perf_counter()
    outs = [fn(*a) for a in inputs[: len(inputs) // 2]]
    jax.block_until_ready(outs)
    t_half = time.perf_counter() - t0
    # full pass
    t0 = time.perf_counter()
    outs = [fn(*a) for a in inputs]
    jax.block_until_ready(outs)
    t_full = time.perf_counter() - t0
    per = (t_full - t_half) / (len(inputs) - len(inputs) // 2)
    print(f"{label:46s} {per*1e3:9.3f} ms   "
          f"(half {t_half*1e3:.1f} full {t_full*1e3:.1f})", flush=True)
    return per


def stage(mk):
    out = []
    for i in range(NIN):
        out.append(jax.device_put(mk(i)))
    jax.block_until_ready(out)
    return out


n = 1 << 21
rng = np.random.default_rng(0)

# 1. elementwise BW floor: (16, 2^21) xor
xs = stage(lambda i: rng.integers(0, 1 << 32, (16, n), dtype=np.uint32))
f_xor = jax.jit(lambda x: x ^ jnp.uint32(3))
bench("(16,2^21) xor (268MB rw)", f_xor, [(x,) for x in xs])

# 2. argsort of 16-bit digits
ds = stage(lambda i: rng.integers(0, 1 << 16, (n,), dtype=np.uint32))
bench("argsort (2^21,) u32", jax.jit(jnp.argsort), [(d,) for d in ds])

# 3. gathers at C in {1, 17, 24}, distinct perms
perms = stage(lambda i: rng.permutation(n).astype(np.int32))
tbl24 = jax.device_put(
    rng.integers(0, 1 << 32, (24, n), dtype=np.uint32))
jax.block_until_ready(tbl24)
f_g24 = jax.jit(lambda ix: jnp.take(tbl24, ix, axis=1))
f_g17 = jax.jit(lambda ix: jnp.take(tbl24[:17], ix, axis=1))
f_g1 = jax.jit(lambda ix: jnp.take(tbl24[0], ix))
bench("gather C=24 minor", f_g24, [(p,) for p in perms])
bench("gather C=17 minor", f_g17, [(p,) for p in perms])
bench("gather C=1", f_g1, [(p,) for p in perms])

# one-hot matmul "gather" alternative for small C? skip — element bound.

# 4. fused rake B=32768 K=64 (the real geometry), distinct digit sets
from aztec_tpu.msm import rake_pallas
from aztec_tpu.curves.spec import BN254_G1

B, K = 32768, 64
packed = jax.device_put(
    rng.integers(0, 1 << 32, (16, K, B // 128, 128), dtype=np.uint32))
jax.block_until_ready(packed)
digs = stage(lambda i: np.sort(
    rng.integers(0, 1 << 16, (n,), dtype=np.uint32)
).reshape(B, K).T.copy().reshape(K, B // 128, 128))
f_rake = jax.jit(
    lambda d: rake_pallas.rake_scan_packed(d, packed, B, K, BN254_G1.field))
bench("fused rake 2^21 adds (B=32768,K=64)", f_rake, [(d,) for d in digs])

# 5. fused bucket phase 2^16
from aztec_tpu.msm import bucket_pallas

nb = 1 << 16
bXs = stage(lambda i: rng.integers(0, 1 << 16, (16, nb), dtype=np.uint32))
bY = jax.device_put(rng.integers(0, 1 << 16, (16, nb), dtype=np.uint32))
bZ = jax.device_put(rng.integers(0, 1 << 16, (16, nb), dtype=np.uint32))
jax.block_until_ready([bY, bZ])
f_bp = jax.jit(lambda bx: bucket_pallas.bucket_phase(
    (bx, bY, bZ), nb, BN254_G1.field, BN254_G1.b))
bench("fused bucket phase 2^16", f_bp, [(b,) for b in bXs])

# 6. pallas mont_mul w=2^21 (wide, amortized)
from aztec_tpu.ff import pallas_field as pf
from aztec_tpu.ff.bn254 import FQ

ys = jax.device_put(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
jax.block_until_ready(ys)
mm_in = stage(lambda i: rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
f_mm = jax.jit(lambda a: pf.mont_mul(a, ys, FQ))
bench("pallas mont_mul w=2^21", f_mm, [(a,) for a in mm_in])

# 7. GLV table at n=2^20 (the per-MSM fixed cost)
from aztec_tpu.msm import glv as glv_mod
from aztec_tpu.numeric.bigint import ints_to_limbs
from aztec_tpu.ff.bn254 import FR_MOD

n20 = 1 << 20
X20 = jax.device_put(rng.integers(0, 1 << 16, (16, n20), dtype=np.uint32))
Y20 = jax.device_put(rng.integers(0, 1 << 16, (16, n20), dtype=np.uint32))
jax.block_until_ready([X20, Y20])
sc_sets = stage(
    lambda i: rng.integers(0, 1 << 16, (16, n20), dtype=np.uint32))
f_glv = jax.jit(lambda s: glv_mod.glv_table((X20, Y20), s, BN254_G1))
bench("glv_table n=2^20", f_glv, [(s,) for s in sc_sets])
