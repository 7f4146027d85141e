#!/usr/bin/env python
"""Tunnel-proof timing: every iteration feeds value-fresh inputs derived
from the previous result, so the axon tunnel can neither memoize nor
overlap independent work.  Overhead of the freshening is one tiny xor.
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
ITERS = int(os.environ.get("PROBE_ITERS", "8"))


def bench(label, step, state0, iters=ITERS):
    """step: state -> state (jitted).  Chained, value-fresh by design."""
    s = step(state0)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:48s} {dt*1e3:9.3f} ms", flush=True)
    return dt


n = 1 << 21
rng = np.random.default_rng(0)

# 0. baseline: tiny chained op (pure latency)
bench("tiny chained xor (latency floor)",
      jax.jit(lambda x: x ^ jnp.uint32(3)), jnp.ones((8, 128), jnp.uint32))

# 1. big elementwise BW: (16, 2^21) = 134 MB in+out
bench("(16,2^21) xor (134MB rw)",
      jax.jit(lambda x: x ^ jnp.uint32(3)), jnp.ones((16, n), jnp.uint32))

# 2. argsort with fresh keys each iter
d0 = jnp.asarray(rng.integers(0, 1 << 16, (n,), dtype=np.uint32))


@jax.jit
def argsort_step(st):
    d, acc = st
    p = jnp.argsort(d)
    # freshen: rotate digits by a data-dependent amount
    return (d ^ p.astype(jnp.uint32)[0] ^ jnp.uint32(1), acc + p[0])


bench("argsort (2^21,) u32 fresh", argsort_step, (d0, jnp.int32(0)))

# 3. gather variants with fresh perm each iter (roll by data-dep amount)
C = 24
planes = jnp.asarray(rng.integers(0, 1 << 16, (C, n), dtype=np.uint32))
rows = jnp.asarray(np.ascontiguousarray(np.asarray(planes).T))
perm0 = jnp.asarray(rng.permutation(n).astype(np.int32))


def mk_gather(kind):
    @jax.jit
    def step(st):
        perm, acc = st
        if kind == "minor":
            g = jnp.take(planes, perm, axis=1)
            tot = g[0, 0]
        elif kind == "rows":
            g = jnp.take(rows, perm, axis=0)
            tot = g[0, 0]
        else:  # rows_t
            g = jnp.take(rows, perm, axis=0).T
            tot = g[0, 0]
        return (jnp.roll(perm, tot.astype(jnp.int32) & 3 | 1), acc + tot)
    return step


for kind in ("minor", "rows", "rows_t"):
    bench(f"gather {kind} (n=2^21, C=24) fresh", mk_gather(kind),
          (perm0, jnp.uint32(0)), iters=4)

# 4. fused Pallas mixed_add at w=32768, fresh inputs
from aztec_tpu.curves.group_ops import JacobianOps
from aztec_tpu.curves import group_pallas as gp
from aztec_tpu.curves.spec import BN254_G1

ops = JacobianOps(BN254_G1)
print("pallas enabled for w=32768:",
      gp.enabled((jnp.zeros((16, 32768), jnp.uint32),) * 2), flush=True)

w = 32768
X = jnp.asarray(rng.integers(0, 1 << 16, (16, w), dtype=np.uint32))
Y = jnp.asarray(rng.integers(0, 1 << 16, (16, w), dtype=np.uint32))
J = ops.from_affine((X, Y))


@jax.jit
def ma_step(st):
    J, k = st
    J2 = ops.mixed_add_unsafe(J, (X ^ k, Y))
    return (J2, k ^ jnp.uint32(1))


bench("mixed_add_unsafe w=32768 fresh (pallas)", ma_step,
      (J, jnp.uint32(1)), iters=16)


@jax.jit
def mm_step(st):
    a, k = st
    from aztec_tpu.ff import pallas_field as pf
    from aztec_tpu.ff.bn254 import FQ
    r = pf.mont_mul(a, Y, FQ)
    return (r ^ (k & jnp.uint32(1)), k + jnp.uint32(1))


bench("pallas mont_mul w=32768 fresh", mm_step, (X, jnp.uint32(1)), iters=16)

# 5. fused rake kernel at B=32768, K=64 with fresh digits
from aztec_tpu.msm import rake_pallas
from aztec_tpu.curves.group_ops import JacobianOps

B, K = 32768, 64
packed = jnp.asarray(
    rng.integers(0, 1 << 32, (16, K, B // 128, 128), dtype=np.uint64)
).astype(jnp.uint32)
dig0 = jnp.asarray(
    rng.integers(0, 1 << 16, (K, B // 128, 128), dtype=np.uint32))


@jax.jit
def rake_step(st):
    dig, k = st
    sc = rake_pallas.rake_scan_packed(dig, packed, B, K, BN254_G1.field)
    return (dig ^ (sc[0][0, 0, 0] & jnp.uint32(1)) ^ k, k ^ jnp.uint32(3))


bench("fused rake B=32768 K=64 fresh", rake_step,
      (dig0, jnp.uint32(1)), iters=8)

# 6. fused bucket phase 2^16 buckets, fresh
from aztec_tpu.msm import bucket_pallas

nb = 1 << 16
bX = jnp.asarray(rng.integers(0, 1 << 16, (16, nb), dtype=np.uint32))
bY = jnp.asarray(rng.integers(0, 1 << 16, (16, nb), dtype=np.uint32))
bZ = jnp.asarray(rng.integers(0, 1 << 16, (16, nb), dtype=np.uint32))


@jax.jit
def bp_step(st):
    bx, k = st
    W = bucket_pallas.bucket_phase((bx, bY, bZ), nb, BN254_G1.field,
                                   BN254_G1.b)
    return (bx ^ (W[0][0, 0] & jnp.uint32(1)) ^ k, k ^ jnp.uint32(3))


bench("fused bucket phase 2^16 fresh", bp_step, (bX, jnp.uint32(1)),
      iters=8)
