"""VPU op-throughput microbench inside Pallas kernels.

Times chains of uint32 mul / add / shift and f32 mul on (8,128) tiles to
find the per-op cost that dominates the fused field kernels.

    python tools/vpu_microbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aztec_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

NOPS = 2048  # ops per element per kernel pass


def make(kind, rows):
    """Kernel doing NOPS vector ops over `rows` independent (8,128) tiles."""

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(rows)]
        b = [b_ref[i] for i in range(rows)]
        acc = a
        reps = NOPS // rows
        for r in range(reps):
            if kind == "mul_u32":
                acc = [x * y for x, y in zip(acc, b)]
            elif kind == "add_u32":
                acc = [x + y for x, y in zip(acc, b)]
            elif kind == "shift_u32":
                acc = [x >> np.uint32(1) for x in acc]
            elif kind == "and_u32":
                acc = [x & np.uint32(0xFFFF) for x in acc]
            elif kind == "mulmask":  # the real inner pattern
                acc = [((x * y) & np.uint32(0xFFFF)) + x for x, y in zip(acc, b)]
            elif kind == "mul_f32":
                if r == 0:
                    acc = [x.astype(jnp.float32) for x in acc]
                    b = [y.astype(jnp.float32) for y in b]
                acc = [x * y for x, y in zip(acc, b)]
        for i in range(rows):
            o_ref[i] = acc[i].astype(jnp.uint32)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
            grid=(a.shape[1] // 8,),
            in_specs=[
                pl.BlockSpec((rows, 8, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
            ] * 2,
            out_specs=pl.BlockSpec((rows, 8, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
        )(a, b)

    return run


def main():
    rng = np.random.default_rng(0)
    nblocks = 64  # grid steps
    rows_set = [4, 16]
    print(f"backend={jax.default_backend()}  NOPS={NOPS} grid={nblocks}",
          flush=True)
    for rows in rows_set:
        a = jnp.asarray(
            rng.integers(0, 1 << 16, (rows, nblocks * 8, 128), dtype=np.uint32))
        b = jnp.asarray(
            rng.integers(1, 1 << 16, (rows, nblocks * 8, 128), dtype=np.uint32))
        for kind in ("add_u32", "mul_u32", "shift_u32", "and_u32", "mulmask",
                     "mul_f32"):
            f = make(kind, rows)
            try:
                r = jax.block_until_ready(f(a, b))
                t0 = time.time()
                for _ in range(20):
                    r = f(a, b)
                jax.block_until_ready(r)
                dt = (time.time() - t0) / 20
                total_vops = NOPS * nblocks  # (8,128)-tile ops
                ns_per_vop = dt / total_vops * 1e9
                print(f"rows={rows:3d} {kind:10s} {dt*1e3:8.3f} ms  "
                      f"{ns_per_vop:7.2f} ns/vec-op", flush=True)
            except Exception as e:
                print(f"rows={rows:3d} {kind:10s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
