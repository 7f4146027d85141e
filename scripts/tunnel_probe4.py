#!/usr/bin/env python
"""Probe 4: variadic lax.sort as the MSM's permutation engine, vs gather.

XLA:TPU lowers sort to a radix sort that runs near HBM bandwidth (probe3:
argsort of 2^21 u32 in ~70us).  If multi-payload sorts scale like
bandwidth (4 radix passes x operands x 2 rw), sorting the packed point
rows AS PAYLOAD beats the 62 ms per-round gather by ~10x.
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
from jax import lax

print("device:", jax.devices()[0], flush=True)
NIN = int(os.environ.get("PROBE_NIN", "6"))


def bench(label, fn, inputs):
    r = fn(*inputs[0])
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in inputs[: len(inputs) // 2]]
    jax.block_until_ready(outs)
    t_half = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*a) for a in inputs]
    jax.block_until_ready(outs)
    t_full = time.perf_counter() - t0
    per = (t_full - t_half) / (len(inputs) - len(inputs) // 2)
    print(f"{label:46s} {per*1e3:9.3f} ms   "
          f"(half {t_half*1e3:.1f} full {t_full*1e3:.1f})", flush=True)
    return per


n = 1 << 21
rng = np.random.default_rng(0)

keys = []
for i in range(NIN):
    keys.append(jax.device_put(
        rng.integers(0, 1 << 16, (n,), dtype=np.uint32)))
jax.block_until_ready(keys)

payload = [jax.device_put(rng.integers(0, 1 << 32, (n,), dtype=np.uint32))
           for _ in range(17)]
jax.block_until_ready(payload)


def mk_sort(np_):
    ops = payload[:np_]

    @jax.jit
    def f(k):
        return lax.sort((k,) + tuple(ops), num_keys=1)
    return f


for np_ in (1, 2, 4, 9, 17):
    bench(f"lax.sort key + {np_} u32 payloads", mk_sort(np_),
          [(k,) for k in keys])

# 2D payload variant: payload as one (n, 16) array? lax.sort requires all
# operands same shape; instead sort key replicated per row is wasteful.
# Try sorting key with ONE u32 payload but n x 2 wider rows via bitcast
# tricks is not possible -> measure 17 separate operands only.

# aligned row gathers for comparison
tbl32 = jax.device_put(rng.integers(0, 1 << 32, (n, 32), dtype=np.uint32))
tbl128 = jax.device_put(rng.integers(0, 1 << 32, (n, 128), dtype=np.uint32))
jax.block_until_ready([tbl32, tbl128])
perms = [jax.device_put(rng.permutation(n).astype(np.int32))
         for _ in range(NIN)]
jax.block_until_ready(perms)
bench("gather rows (n,32) aligned 128B",
      jax.jit(lambda ix: jnp.take(tbl32, ix, axis=0)),
      [(p,) for p in perms])
bench("gather rows (n,128) aligned 512B",
      jax.jit(lambda ix: jnp.take(tbl128, ix, axis=0)),
      [(p,) for p in perms])

# leftover probe3 items: bucket phase + glv table
from aztec_tpu.msm import bucket_pallas
from aztec_tpu.curves.spec import BN254_G1

nb = 1 << 16
bXs = [jax.device_put(rng.integers(0, 1 << 16, (16, nb), dtype=np.uint32))
       for _ in range(NIN)]
bY = jax.device_put(rng.integers(0, 1 << 16, (16, nb), dtype=np.uint32))
bZ = jax.device_put(rng.integers(0, 1 << 16, (16, nb), dtype=np.uint32))
jax.block_until_ready(bXs + [bY, bZ])
f_bp = jax.jit(lambda bx: bucket_pallas.bucket_phase(
    (bx, bY, bZ), nb, BN254_G1.field, BN254_G1.b))
bench("fused bucket phase 2^16", f_bp, [(b,) for b in bXs])

from aztec_tpu.msm import glv as glv_mod

n20 = 1 << 20
X20 = jax.device_put(rng.integers(0, 1 << 16, (16, n20), dtype=np.uint32))
Y20 = jax.device_put(rng.integers(0, 1 << 16, (16, n20), dtype=np.uint32))
jax.block_until_ready([X20, Y20])
sc_sets = [jax.device_put(
    rng.integers(0, 1 << 16, (16, n20), dtype=np.uint32))
    for _ in range(NIN)]
jax.block_until_ready(sc_sets)
f_glv = jax.jit(lambda s: glv_mod.glv_table((X20, Y20), s, BN254_G1))
bench("glv_table n=2^20", f_glv, [(s,) for s in sc_sets])

# hillis carry scan cost at B=32768 (the per-round cross-block fixup)
from aztec_tpu.curves.group_ops import JacobianOps
from aztec_tpu.msm.pippenger import _hillis_seg_scan

ops = JacobianOps(BN254_G1)
B = 32768
Ts = [tuple(jax.device_put(
    rng.integers(0, 1 << 16, (16, B), dtype=np.uint32)) for _ in range(3))
    for _ in range(NIN)]
jax.block_until_ready([t for tt in Ts for t in tt])
F0 = jax.device_put((rng.integers(0, 2, (B,)) > 0))


@jax.jit
def f_carry(TX, TY, TZ):
    return _hillis_seg_scan(ops, (TX, TY, TZ), F0)


bench("hillis seg scan B=32768 (15 steps)", f_carry, Ts)
