"""Pallas TPU kernel for Montgomery multiplication on limb planes.

The jnp implementation (limb.py) expands each mont_mul into ~1k HLO ops —
fine for XLA's fusion but costly to compile and HBM-bound when chained.
This kernel keeps the whole REDC pipeline (schoolbook products, column
accumulation, carry propagation, conditional subtraction) in VMEM /
registers for a (16, BLOCK) tile per grid step.

Layout: a, b, out are (16, N) uint32 planes (N a multiple of BLOCK).
Everything inside is uint32 vector math on (1, BLOCK) rows: 16x16-bit
products fit in 32 bits; column sums stay < 2^22 (same slack analysis as
limb.py).  Carry resolution is a sequential 16-step ripple per canon —
sequential in the *limb* axis only, fully vectorized across lanes, which
is the right trade inside VMEM.

Use ``mont_mul`` below as a drop-in for limb.mont_mul on TPU; it falls
back to the jnp path on other backends or for shapes that don't tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import FieldSpec
from . import limb as limb_jnp

BLOCK = 512
L = 16
MASK = jnp.uint32(0xFFFF)


def _ripple_canon(cols, nout):
    """cols: list of (1, B) uint32 redundant columns -> nout canonical
    digits + carry row.  Sequential ripple (nout steps of vector ops)."""
    out = []
    carry = jnp.zeros_like(cols[0])
    for i in range(len(cols)):
        v = cols[i] + carry
        out.append(v & MASK)
        carry = v >> 16
    # any residual carry beyond the provided columns
    return out[:nout], out[nout:], carry


def _geq(a_digits, b_digits):
    """lexicographic a >= b over 16 canonical digit rows (MSB-down)."""
    gt = jnp.zeros_like(a_digits[0], dtype=jnp.bool_)
    eq = jnp.ones_like(a_digits[0], dtype=jnp.bool_)
    for i in range(L - 1, -1, -1):
        gt = gt | (eq & (a_digits[i] > b_digits[i]))
        eq = eq & (a_digits[i] == b_digits[i])
    return gt | eq


def _make_kernel(spec: FieldSpec):
    p = [int(x) for x in spec.p_limbs]
    pprime = [int(x) for x in spec.pprime_limbs]

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i : i + 1, :] for i in range(L)]
        b = [b_ref[i : i + 1, :] for i in range(L)]

        # T = a * b -> 32 redundant columns
        cols = [jnp.zeros_like(a[0]) for _ in range(2 * L)]
        for i in range(L):
            for j in range(L):
                prod = a[i] * b[j]
                cols[i + j] = cols[i + j] + (prod & MASK)
                cols[i + j + 1] = cols[i + j + 1] + (prod >> 16)

        tlow, thi_extra, c16 = _ripple_canon(cols[:L], L)
        thi = cols[L:]
        thi[0] = thi[0] + c16
        # leftover canonical digits beyond L from the low half: none (we
        # canonicalized exactly L columns; thi_extra is empty by design)

        # m = (tlow * p') mod R  (low 16 columns only)
        mcols = [jnp.zeros_like(a[0]) for _ in range(L)]
        for i in range(L):
            w = L - i
            for j in range(w):
                prod = tlow[i] * jnp.uint32(pprime[j])
                mcols[i + j] = mcols[i + j] + (prod & MASK)
                if i + j + 1 < L:
                    mcols[i + j + 1] = mcols[i + j + 1] + (prod >> 16)
        m, _, _ = _ripple_canon(mcols, L)

        # U = T + m*p; result = U >> 256
        ucols = [tlow[i] for i in range(L)] + [thi[i] for i in range(L)]
        for i in range(L):
            for j in range(L):
                prod = m[i] * jnp.uint32(p[j])
                ucols[i + j] = ucols[i + j] + (prod & MASK)
                ucols[i + j + 1] = ucols[i + j + 1] + (prod >> 16)
        udigits, _, ucarry = _ripple_canon(ucols, 2 * L)
        t = udigits[L:]
        # ucarry is the bit beyond 512: t < 2p guaranteed, carry folds into
        # the conditional subtraction via the comparison below (t fits 256b
        # when inputs < p; ucarry is always 0 under spec's p < R/4 bound)

        # conditional subtract p
        pd = [jnp.full_like(a[0], np.uint32(x)) for x in p]
        ge = _geq(t, pd)
        borrow = jnp.zeros_like(a[0])
        res = []
        for i in range(L):
            diff = t[i] + jnp.uint32(0x10000) - pd[i] - borrow
            res.append(jnp.where(ge, diff & MASK, t[i]))
            borrow = jnp.where(diff >> 16 == 0, jnp.uint32(1), jnp.uint32(0))
        for i in range(L):
            o_ref[i : i + 1, :] = res[i]

    return kernel


@functools.partial(jax.jit, static_argnames=("spec",))
def _mont_mul_pallas_2d(a, b, spec: FieldSpec):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a.shape[1]
    grid = n // BLOCK
    return pl.pallas_call(
        _make_kernel(spec),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((L, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(a, b)


def mont_mul(a, b, spec: FieldSpec):
    """Pallas-backed Montgomery product with jnp fallback.

    Broadcasts to a common batch shape, flattens, pads to BLOCK, runs the
    kernel, and unpads.  Falls back to limb.mont_mul off-TPU.
    """
    if jax.default_backend() not in ("tpu",):
        return limb_jnp.mont_mul(a, b, spec)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    af = jnp.broadcast_to(a, shape).reshape(L, -1)
    bf = jnp.broadcast_to(b, shape).reshape(L, -1)
    n = af.shape[1]
    pad = (-n) % BLOCK
    if pad:
        af = jnp.pad(af, ((0, 0), (0, pad)))
        bf = jnp.pad(bf, ((0, 0), (0, pad)))
    out = _mont_mul_pallas_2d(af, bf, spec)
    if pad:
        out = out[:, :n]
    return out.reshape(shape)
