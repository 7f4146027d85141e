"""Batch fixed-base scalar multiplication: k_i * G for many k_i, one base.

Used to synthesize test/dev reference strings (tau^i * G) entirely on device
and later by Pedersen generator ladders (the role of the reference's
fixed_base_ladder tables, crypto/pedersen/pedersen.hpp:7-19).  Windowed-table
method: per w-bit window j, a table T_j[d] = d * 2^(w j) * G built with a
Hillis prefix scan over a constant row, then each scalar gathers one entry
per window and folds them with complete adds.

All group math runs on the branchless complete projective ops (RCB16,
curves/group.py) — table entries systematically coincide (d*G vs d*G) and
entry 0 is the identity, so completeness is required, and the RCB formulas
are both cheaper and far smaller in the XLA graph than the Jacobian
add_complete composite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from . import group
from .group_ops import JacobianOps
from .spec import CurveSpec


def _prefix_scan_c(ops, V):
    n = V[0].shape[-1]
    steps = max((n - 1).bit_length(), 1)
    idx = jnp.arange(n)

    def step(s, V):
        d = jnp.int32(1) << s
        shifted = tuple(jnp.roll(a, d, axis=-1) for a in V)
        combined = ops.c_add(shifted, V)
        return ops.select(idx >= d, combined, V)

    return lax.fori_loop(0, steps, step, V)


@functools.partial(jax.jit, static_argnames=("curve", "w"))
def _window_tables(GX, GY, curve: CurveSpec, w: int):
    """T[j][d] = d * 2^(w j) * G as projective planes tuple of (nw, L, 2^w)."""
    spec = curve.field
    ops = JacobianOps(curve)
    nw = 256 // w
    size = 1 << w

    def build_window(base, _):
        row = tuple(jnp.broadcast_to(a, (spec.nlimbs, size)) for a in base)
        keep = jnp.arange(size) != 0  # entry 0 = identity
        row = ops.c_mask_to_infinity(keep, row)
        table = _prefix_scan_c(ops, row)

        def dblw(_, a):
            return ops.c_dbl(a)

        base = lax.fori_loop(0, w, dblw, base)
        return base, table

    G = ops.j2c(group.from_affine((GX, GY), spec))
    _, tables = lax.scan(build_window, G, None, length=nw)
    return tables


@functools.partial(jax.jit, static_argnames=("curve", "w"))
def _gather_and_sum(tables, scalars, curve: CurveSpec, w: int):
    ops = JacobianOps(curve)
    n = scalars.shape[1]
    nw = 256 // w
    mask = jnp.uint32((1 << w) - 1)

    acc = ops.c_infinity((n,))

    def step(j, acc):
        limb_idx = (w * j) // 16
        shift = (w * j) % 16
        row = lax.dynamic_index_in_dim(scalars, limb_idx, axis=0, keepdims=False)
        digit = (row >> jnp.uint32(shift)) & mask
        entry = tuple(
            lax.dynamic_index_in_dim(t, j, axis=0, keepdims=False)[:, digit]
            for t in tables
        )
        return ops.c_add(acc, entry)

    acc = lax.fori_loop(0, nw, step, acc)
    return ops.c2j(acc)


def fixed_base_mul(scalars, curve: CurveSpec, w: int = 8):
    """scalars: (16, n) canonical uint32 planes -> Jacobian batch k_i * G."""
    from ..numeric.bigint import int_to_limbs

    f = curve.field
    gx = jnp.asarray(int_to_limbs((curve.gen_x * f.R) % f.modulus))
    gy = jnp.asarray(int_to_limbs((curve.gen_y * f.R) % f.modulus))
    tables = _window_tables(gx[:, None], gy[:, None], curve, w)
    return _gather_and_sum(tables, scalars, curve, w)
