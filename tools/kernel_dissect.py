"""Dissect the fused mont_mul pallas kernel: which stage eats the cycles?

Variants, each as its own kernel over identical (16, nf, 128) planes:
  products   - 256 muls + lo/hi accumulate into 32 cols (no canon)
  comba      - product-scanning order, fused ripple canon
  canon4     - 4 ripple canons only
  mont_full  - current KF.mul
  mont_comba - comba-structured REDC (if implemented)

    python tools/kernel_dissect.py
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

from aztec_tpu.curves.spec import BN254_G1  # noqa: E402
from aztec_tpu.ff.pallas_field import KF, L, MASK16  # noqa: E402

SPEC = BN254_G1.field
kf = KF(SPEC)


def run_kernel(body, nf, rows_per_block=8):
    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(L)]
        b = [b_ref[i] for i in range(L)]
        out = body(a, b)
        for i in range(L):
            o_ref[i] = out[i]

    blk = pl.BlockSpec((L, rows_per_block, 128), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, nf, 128), jnp.uint32),
            grid=(nf // rows_per_block,),
            in_specs=[blk, blk],
            out_specs=blk,
        )(a, b)

    return run


def body_products(a, b):
    cols = kf.mul_cols(a, b)
    # fold 32 cols to 16 outputs so nothing is DCE'd
    return [cols[i] + cols[i + L] for i in range(L)]


def body_mont(a, b):
    return kf.mul(a, b)


def body_canon4(a, b):
    x = [ai + bi for ai, bi in zip(a, b)]
    for _ in range(4):
        x, _ = kf.canon(x)
        x = [xi + bi for xi, bi in zip(x, b)]
    return x


def body_comba_full(a, b):
    """Product-scanning a*b, low 16 digits canonical, high cols folded."""
    carry = None
    tlow = []
    his = None
    highs = []
    for k in range(2 * L):
        col = his
        his = None
        for i in range(max(0, k - L + 1), min(k + 1, L)):
            j = k - i
            p = a[i] * b[j]
            lo = p & MASK16
            col = lo if col is None else col + lo
            h = p >> 16
            his = h if his is None else his + h
        if col is None:
            col = jnp.zeros_like(a[0])
        if k < L:
            v = col if carry is None else col + carry
            tlow.append(v & MASK16)
            carry = v >> 16
        else:
            highs.append(col)
    return [tlow[i] + highs[i] for i in range(L)]


def body_mont_comba(a, b):
    return kf.mul_comba(a, b) if hasattr(kf, "mul_comba") else kf.mul(a, b)


def main():
    rng = np.random.default_rng(3)
    nf = 8 * 64
    a = jnp.asarray(rng.integers(0, 1 << 16, (L, nf, 128), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (L, nf, 128), dtype=np.uint32))
    nelem = nf * 128
    print(f"backend={jax.default_backend()} elems={nelem}", flush=True)
    for name, body in [
        ("products(256mul,32col)", body_products),
        ("comba_full", body_comba_full),
        ("canon4", body_canon4),
        ("mont_full(KF.mul)", body_mont),
    ]:
        try:
            f = run_kernel(body, nf)
            t0 = time.time()
            jax.block_until_ready(f(a, b))
            comp = time.time() - t0
            t0 = time.time()
            iters = 30
            for _ in range(iters):
                r = f(a, b)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / iters
            print(f"{name:24s} {dt*1e6:9.1f} us total  "
                  f"{dt/nelem*1e9:7.2f} ns/elem  (compile {comp:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
