"""Batched Pedersen hashing on device — many hashes per dispatch.

The reference hashes Merkle nodes one pair at a time with 2 OpenMP threads
(pedersen.cpp:274-299); here H independent hash lanes walk the fixed-base
ladder together: the 127-step ladder chain is a ``fori_loop`` whose body is
a width-H batch of complete additions, with the 2-bit WNAF digits computed
on device by a ``lax.scan`` mirror of the host recoder
(ecc/groups/wnaf.hpp fixed_wnaf).

Inputs/outputs are canonical (non-Montgomery) uint32 limb planes over the
grumpkin base field (bn254 Fr).  Used for bulk Merkle tree construction
(merkle/) and the batched transcript hashing of rollup circuits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ff import FR, limb
from ..ff.bn254 import FR_MOD
from ..numeric.bigint import ints_to_limbs, int_to_limbs
from ..curves import group
from ..curves.spec import GRUMPKIN_G1
from . import pedersen as pd

NUM_QUADS = pd.NUM_QUADS  # 127


@functools.lru_cache(maxsize=None)
def _ladder_tables(hash_index: int):
    """Device tables for one hash generator pair: Montgomery planes
    (L, 127) for one.x/one.y/three.x/three.y (the [1:] hash-ladder slice
    used by 254-bit hashing), plus origin points and skew generator."""
    lad = pd._hash_ladder(hash_index)[pd.QUAD_LENGTH - NUM_QUADS - 1 :]
    R = FR.R

    def mont_planes(vals):
        return jnp.asarray(ints_to_limbs([v * R % FR_MOD for v in vals]))

    ones_x = mont_planes([e[0][0] for e in lad[1:]])
    ones_y = mont_planes([e[0][1] for e in lad[1:]])
    threes_x = mont_planes([e[1][0] for e in lad[1:]])
    threes_y = mont_planes([e[1][1] for e in lad[1:]])
    origin = lad[0][0]
    gen_skew = pd.get_generator(hash_index * 2 + 1)
    origin_skew = pd.g_add(origin, gen_skew)

    def mont_pt(pt):
        return (
            jnp.asarray(int_to_limbs(pt[0] * R % FR_MOD)),
            jnp.asarray(int_to_limbs(pt[1] * R % FR_MOD)),
        )

    return (ones_x, ones_y, threes_x, threes_y, mont_pt(origin),
            mont_pt(origin_skew))


def _wnaf_digits(base, n_lanes):
    """base: (L, H) canonical planes (odd or even-with-skew semantics).

    Returns (digit3 (127, H) bool MSB-first, negate (127, H) bool,
    skew (H,) bool) mirroring fixed_wnaf(num_bits=255, wnaf=2)."""
    H = n_lanes
    # windows W[j] = (base >> 2j) & 3, j = 0..127
    rows = []
    for j in range(NUM_QUADS + 1):
        limb_idx = (2 * j) // 16
        shift = (2 * j) % 16
        w = (base[limb_idx] >> jnp.uint32(shift)) & jnp.uint32(3)
        if shift == 15:  # window straddles two limbs
            hi = (base[limb_idx + 1] & jnp.uint32(1)) << 1
            w = (w & jnp.uint32(1)) | hi
        rows.append(w)
    W = jnp.stack(rows, axis=0)  # (128, H) uint32

    skew = (W[0] & 1) == 0
    previous0 = W[0] + skew.astype(jnp.uint32)

    def step(prev, wj):
        pred = (wj & 1) == 0
        predu = pred.astype(jnp.uint32)
        v = prev - (predu << 2)
        v = jnp.where(pred, ~v, v)
        digit = (v >> 1) & jnp.uint32(0x7FFFFFFF)
        return wj + predu, (digit, pred)

    # rounds j = 1..127 produce entries for wnaf positions 127..1
    _, (digits_rev, neg_rev) = lax.scan(step, previous0, W[1:])
    # wnaf[i] for i = 1..127 is digits_rev reversed (MSB-first order)
    digit3 = jnp.flip(digits_rev == 1, axis=0)
    negate = jnp.flip(neg_rev, axis=0)
    return digit3, negate, skew


@functools.partial(jax.jit, static_argnames=("hash_index",))
def hash_single_batch(values, hash_index: int):
    """values: (L, H) canonical planes -> Jacobian hash points (Montgomery).

    Mirrors pd.hash_single lane-wise; value == 0 maps to infinity."""
    spec = FR
    H = values.shape[1]
    (ox, oy, tx, ty, origin, origin_skew) = _ladder_tables(hash_index)

    two = jnp.zeros_like(values).at[0].set(2)
    is_odd = (values[0] & 1) == 1
    base = jnp.where(is_odd[None], values, limb.sub_mod(values, two, spec))

    digit3, negate, skew = _wnaf_digits(base, H)

    accx = jnp.where(skew[None], origin_skew[0][:, None], origin[0][:, None])
    accy = jnp.where(skew[None], origin_skew[1][:, None], origin[1][:, None])
    acc = (
        jnp.broadcast_to(accx, values.shape),
        jnp.broadcast_to(accy, values.shape),
        jnp.broadcast_to(limb.const(spec.one_mont_limbs, 2), values.shape),
    )

    def step(i, acc):
        d3 = lax.dynamic_index_in_dim(digit3, i, axis=0, keepdims=False)[None]
        ng = lax.dynamic_index_in_dim(negate, i, axis=0, keepdims=False)[None]
        ox_i = lax.dynamic_index_in_dim(ox, i, axis=1, keepdims=True)
        oy_i = lax.dynamic_index_in_dim(oy, i, axis=1, keepdims=True)
        tx_i = lax.dynamic_index_in_dim(tx, i, axis=1, keepdims=True)
        ty_i = lax.dynamic_index_in_dim(ty, i, axis=1, keepdims=True)
        px = jnp.broadcast_to(jnp.where(d3, tx_i, ox_i), values.shape)
        py = jnp.broadcast_to(jnp.where(d3, ty_i, oy_i), values.shape)
        py = jnp.where(ng, limb.neg_mod(py, spec), py)
        return group.add_complete(acc, group.from_affine((px, py), spec), spec)

    acc = lax.fori_loop(0, NUM_QUADS, step, acc)
    zero_in = limb.is_zero(values)
    X, Y, Z = acc
    return (X, Y, jnp.where(zero_in[None], jnp.zeros_like(Z), Z))


@functools.partial(jax.jit, static_argnames=("hash_index",))
def compress_batch(left, right, hash_index: int = 0):
    """Batched compress: x(hash(l, i) + hash(r, i+1)) as canonical planes."""
    h1 = hash_single_batch(left, hash_index)
    h2 = hash_single_batch(right, hash_index + 1)
    s = group.add_complete(h1, h2, FR)
    x, y, inf = group.to_affine(s, FR)
    xc = limb.from_mont(x, FR)
    return jnp.where(inf[None], jnp.zeros_like(xc), xc)
