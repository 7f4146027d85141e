#!/usr/bin/env python
"""Probe the axon TPU tunnel's dispatch characteristics:

- per-dispatch latency (chained tiny ops, sync every iter vs async pipeline)
- device throughput floor (one big fused op, chained)
- gather variants at MSM shapes (minor-axis vs row-major vs packed rows)

These set the design constants for the staged MSM (how much per-round
dispatch overhead is affordable, which gather layout to use)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from aztec_tpu.utils import setup_compile_cache
setup_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev, flush=True)


def bench(label, fn, *args, iters=8, chain=False):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    if chain:
        x = args[0]
        for _ in range(iters):
            x = fn(x, *args[1:])
        jax.block_until_ready(x)
    else:
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1e3:9.3f} ms", flush=True)
    return dt


# 1. dispatch latency: tiny add, chained (forces serialization)
tiny = jnp.ones((8, 128), jnp.float32)
f_tiny = jax.jit(lambda x: x + 1.0)
bench("tiny add, chained x8 (latency)", f_tiny, tiny, chain=True)
bench("tiny add, unchained x8 (pipeline)", f_tiny, tiny)

# sync per-iteration
r = f_tiny(tiny)
jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(8):
    jax.block_until_ready(f_tiny(tiny))
dt = (time.perf_counter() - t0) / 8
print(f"{'tiny add, block every iter':44s} {dt*1e3:9.3f} ms", flush=True)

# 2. medium op: (16, 2^21) u32 elementwise
big = jnp.ones((16, 1 << 21), jnp.uint32)
f_big = jax.jit(lambda x: x ^ jnp.uint32(1))
bench("(16,2^21) xor, chained (BW ~270MB)", f_big, big, chain=True)

# 3. gather variants at n=2^21, C=24
n = 1 << 21
C = 24
rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(n).astype(np.int32))
planes = jnp.asarray(rng.integers(0, 1 << 16, (C, n), dtype=np.uint32))
rows = planes.T.copy()  # (n, C) row-major

f_minor = jax.jit(lambda p, ix: jnp.take(p, ix, axis=1))
f_rows = jax.jit(lambda p, ix: jnp.take(p, ix, axis=0))
f_rows_t = jax.jit(lambda p, ix: jnp.take(p, ix, axis=0).T)
bench("gather minor-axis (24, 2^21)", f_minor, planes, perm, iters=4)
bench("gather rows (2^21, 24)", f_rows, rows, perm, iters=4)
bench("gather rows + transpose back", f_rows_t, rows, perm, iters=4)

# 4. argsort u32 2^21 and batched 8x
d = jnp.asarray(rng.integers(0, 1 << 16, (n,), dtype=np.uint32))
d8 = jnp.asarray(rng.integers(0, 1 << 16, (8, n), dtype=np.uint32))
bench("argsort (2^21,) u32", jax.jit(jnp.argsort), d, iters=4)
bench("argsort batched (8, 2^21)", jax.jit(lambda x: jnp.argsort(x, axis=-1)), d8, iters=2)

# 5. sort u32 key + u32 payload (for perm via sort pairs)
f_pair = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
v = jnp.arange(n, dtype=jnp.uint32)
bench("lax.sort pair (2^21,)", f_pair, d, v, iters=4)
