#!/usr/bin/env python
"""Probe 5: STRICT dependence-chained, value-fresh timing.

The axon tunnel overlaps independent dispatches (probe3/4: independent
same-executable calls read ~0 ms each), and memoizes repeated values, so
the ONLY trustworthy protocol is: each iteration's input = f(previous
iteration's OUTPUT, fresh pre-staged salt).  That forces serialization
and defeats memoization; the salt-mix cost (~one xor over the operand) is
measured separately and subtracted mentally.
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
ITERS = int(os.environ.get("PROBE_ITERS", "8"))
n = 1 << 21
rng = np.random.default_rng(0)


def chain_bench(label, step, state0, salts, iters=ITERS):
    s = step(state0, salts[0])
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for i in range(iters):
        s = step(s, salts[(i + 1) % len(salts)])
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def stage(mk, k=4):
    out = [jax.device_put(mk(i)) for i in range(k)]
    jax.block_until_ready(out)
    return out


# 0. salt-mix floor: xor of (n,) with scalar from prev output
salts1 = stage(lambda i: rng.integers(0, 1 << 16, (n,), dtype=np.uint32))


@jax.jit
def xor_step(s, salt):
    return s ^ salt ^ (s[0] & jnp.uint32(1))


chain_bench("floor: (2^21,) xor + scalar dep", xor_step, salts1[0], salts1)

# 1. argsort chained
@jax.jit
def argsort_step(s, salt):
    p = jnp.argsort(s)
    return s ^ salt ^ (p[0].astype(jnp.uint32) & jnp.uint32(1))


chain_bench("argsort (2^21,) u32", argsort_step, salts1[0], salts1)


# 2. variadic sort: key + P payloads, chained through key AND payloads
def mk_sort_step(P):
    @jax.jit
    def step(state, salt):
        k = state[0]
        outs = lax.sort(state, num_keys=1)
        mix = outs[1][0] & jnp.uint32(1)
        newk = (outs[0] ^ salt ^ mix) & jnp.uint32(0xFFFF)
        return (newk,) + tuple(o ^ mix for o in outs[1:])
    return step


for P in (1, 4, 9, 17):
    st0 = (salts1[0],) + tuple(
        jax.device_put(rng.integers(0, 1 << 32, (n,), dtype=np.uint32))
        for _ in range(P))
    jax.block_until_ready(st0)
    chain_bench(f"lax.sort key + {P} payloads (chained)",
                mk_sort_step(P), st0, salts1)

# 3. gather C=17 chained (baseline permutation engine)
tbl = jax.device_put(rng.integers(0, 1 << 32, (17, n), dtype=np.uint32))
jax.block_until_ready(tbl)
perm0 = jax.device_put(rng.permutation(n).astype(np.int32))


@jax.jit
def gather_step(perm, salt):
    g = jnp.take(tbl, perm, axis=1)
    return jnp.roll(perm, g[0, 0].astype(jnp.int32) & 3 | 1)


chain_bench("gather C=17 minor (chained)", gather_step, perm0, salts1)

# 4. bucket phase chained
from aztec_tpu.msm import bucket_pallas
from aztec_tpu.curves.spec import BN254_G1

nb = 1 << 16
salts_b = stage(lambda i: rng.integers(0, 1 << 16, (16, nb), dtype=np.uint32))
bY = jax.device_put(rng.integers(0, 1 << 16, (16, nb), dtype=np.uint32))
bZ = jax.device_put(rng.integers(0, 1 << 16, (16, nb), dtype=np.uint32))
jax.block_until_ready([bY, bZ])


@jax.jit
def bp_step(bx, salt):
    W = bucket_pallas.bucket_phase((bx, bY, bZ), nb, BN254_G1.field,
                                   BN254_G1.b)
    return bx ^ salt ^ (W[0][0, 0] & jnp.uint32(1))


chain_bench("fused bucket 2^16 (chained)", bp_step, salts_b[0], salts_b)

# 5. hillis carry scan at B=32768 and B=8192
from aztec_tpu.curves.group_ops import JacobianOps
from aztec_tpu.msm.pippenger import _hillis_seg_scan

ops = JacobianOps(BN254_G1)
for B in (32768, 8192):
    TY = jax.device_put(rng.integers(0, 1 << 16, (16, B), dtype=np.uint32))
    TZ = jax.device_put(rng.integers(0, 1 << 16, (16, B), dtype=np.uint32))
    F0 = jax.device_put(rng.integers(0, 2, (B,)) > 0)
    jax.block_until_ready([TY, TZ, F0])
    saltsT = stage(lambda i: rng.integers(0, 1 << 16, (16, B),
                                          dtype=np.uint32))

    @jax.jit
    def carry_step(tx, salt):
        V = _hillis_seg_scan(ops, (tx, TY, TZ), F0)
        return tx ^ salt ^ (V[0][0, 0] & jnp.uint32(1))

    chain_bench(f"hillis seg scan B={B}", carry_step, saltsT[0], saltsT)

# 6. glv_table chained
from aztec_tpu.msm import glv as glv_mod

n20 = 1 << 20
X20 = jax.device_put(rng.integers(0, 1 << 16, (16, n20), dtype=np.uint32))
Y20 = jax.device_put(rng.integers(0, 1 << 16, (16, n20), dtype=np.uint32))
jax.block_until_ready([X20, Y20])
salts20 = stage(lambda i: rng.integers(0, 1 << 16, (16, n20),
                                       dtype=np.uint32), k=3)


@jax.jit
def glv_step(s, salt):
    (Xt, Yt), st = glv_mod.glv_table((X20, Y20), s, BN254_G1)
    return (s ^ salt ^ (st[0, 0] & jnp.uint32(1))) % jnp.uint32(1 << 16)


chain_bench("glv_table n=2^20 (chained)", glv_step, salts20[0], salts20,
            iters=4)

# 7. tails gather: 2^16+ indices from (16, 2^21) x3 planes
tk0 = jax.device_put(rng.integers(0, n, (nb,), dtype=np.int32))
SX = jax.device_put(rng.integers(0, 1 << 32, (16, n), dtype=np.uint32))
jax.block_until_ready([tk0, SX])


@jax.jit
def tails_step(tk, salt):
    g1 = jnp.take(tbl, tk, axis=1)
    g2 = jnp.take(SX, tk, axis=1)
    return (tk + (g1[0, 0] + g2[0, 0]).astype(jnp.int32) % 7 + 1) % n


chain_bench("2x tail gathers 2^16 idx (chained)", tails_step, tk0, salts1)
