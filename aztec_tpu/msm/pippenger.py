"""Pippenger bucket-method MSM as batched TPU kernels.

TPU-native re-design of the reference's Pippenger
(ecc/curves/bn254/scalar_multiplication/scalar_multiplication.cpp): the
reference radix-sorts a point_schedule and walks gather/prefetch addition
chains per thread — a CPU-cache design.  Here each window round is:

1. digit extraction from scalar limb planes (c-bit windows),
2. one device argsort of the digits (XLA sort ~ the radix sort's role),
3. a **rake scan**: the sorted stream reshaped to (B blocks x K columns);
   each block accumulates its runs sequentially (fori_loop of width-B batched
   mixed-adds => exactly n point additions, one compiled body); cross-block
   segments are fixed up with a Hillis-Steele segmented scan over the B block
   summaries (log B steps),
4. segment tails scattered into the bucket array (scatter mode='drop'
   discards bucket 0 and non-tails),
5. bucket reduction sum_j j*B_j via the suffix-sum identity
   sum_{j>=1} S_j (S = suffix sums), computed with the same rake pattern
   over the 2^c buckets,
6. c doublings fold rounds together (MSB-first).

The engine is **group-generic**: it manipulates opaque tuples of arrays via a
``GroupOps`` bundle (curves/group_ops.py), so its indexing logic is unit-
tested against a mock integer group, then instantiated with Jacobian ops.

Point additions use `unsafe` variants exactly as the reference's
pippenger_unsafe (scalar_multiplication.cpp:923): inputs must be pairwise
linearly independent (true for SRS monomials); infinities are handled.

Everything runs inside ONE jit with a lax.fori_loop over rounds: compile
size is O(1) in n and rounds.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..curves.group_ops import JacobianOps, IntModOps
from ..curves.spec import CurveSpec


@dataclasses.dataclass(frozen=True)
class MSMConfig:
    c: int = 16             # window bits; must divide 16
    block: int = 64         # K: serial accumulation depth per rake lane
    bucket_block: int = 64  # K2: serial depth for the bucket-phase rake
    glv: bool = False       # endomorphism split: half the rounds, 2x points

    def rounds(self) -> int:
        return (128 if self.glv else 256) // self.c


def default_config(n: int) -> MSMConfig:
    """Bucket-width heuristic (role of the reference's bucket table,
    runtime_states.hpp:9-57): balance n adds/round vs ~2.5*2^c bucket adds.
    GLV is on by default (halves doublings + bucket phases; the msm()
    wrapper silently drops it for curves with no usable endomorphism)."""
    if n >= 1 << 18:
        return MSMConfig(c=16, glv=True)
    if n >= 1 << 12:
        return MSMConfig(c=8, bucket_block=16, glv=True)
    return MSMConfig(c=4, block=32, bucket_block=4, glv=True)


def _roll(P, shift):
    return tuple(jnp.roll(a, shift, axis=-1) for a in P)


def _hillis_seg_scan(ops, V, F):
    """Inclusive segmented scan (group add) over the last axis of V with
    head flags F (True = segment start)."""
    B = F.shape[0]
    steps = max((B - 1).bit_length(), 1)
    idx = jnp.arange(B)

    def step(s, carry):
        V, F = carry
        d = jnp.int32(1) << s
        Vp = _roll(V, d)
        Fp = jnp.roll(F, d)
        valid = (idx >= d) & ~F
        combined = ops.add_unsafe(Vp, V)
        Vn = ops.select(valid, combined, V)
        Fn = F | jnp.where(idx >= d, Fp, True)
        return (Vn, Fn)

    V, F = lax.fori_loop(0, steps, step, (V, F))
    return V


def _hillis_scan(ops, V, add):
    """Inclusive unsegmented scan over the last axis with the given add."""
    B = V[0].shape[-1]
    steps = max((B - 1).bit_length(), 1)
    idx = jnp.arange(B)

    def step(s, V):
        d = jnp.int32(1) << s
        combined = add(_roll(V, d), V)
        return ops.select(idx >= d, combined, V)

    return lax.fori_loop(0, steps, step, V)


def _rake_segment_scan(ops, sd, pts, B: int, K: int):
    """Sorted digit stream -> running segment partials + cross-block carries.

    Returns (scan: tuple of (*, B, K), C: carry to add to each block's
    first-run tail, fr: (B, K) first-run mask, sdb: (B, K) digits).
    """
    sdb = sd.reshape(B, K)
    ptsb = tuple(p.reshape(p.shape[:-1] + (B, K)) for p in pts)

    sentinel = jnp.full((B,), 0x1FFFF, jnp.uint32)
    inf = ops.infinity((B,))
    out0 = tuple(
        jnp.zeros(i.shape + (K,), i.dtype) for i in inf
    )

    def step(k, carry):
        accP, accd, out = carry
        dk = lax.dynamic_index_in_dim(sdb, k, axis=1, keepdims=False)  # (B,)
        Pk = tuple(
            lax.dynamic_index_in_dim(p, k, axis=p.ndim - 1, keepdims=False)
            for p in ptsb
        )
        same = dk == accd
        added = ops.mixed_add_unsafe(accP, Pk)
        fresh = ops.from_affine(Pk)
        newP = ops.select(same, added, fresh)
        out = tuple(
            lax.dynamic_update_index_in_dim(o, v, k, axis=o.ndim - 1)
            for o, v in zip(out, newP)
        )
        return (newP, dk, out)

    _, _, scan = lax.fori_loop(0, K, step, (inf, sentinel, out0))

    # block summaries
    h = sdb[:, 0]
    t = sdb[:, K - 1]
    T = tuple(s[..., K - 1] for s in scan)  # block-tail partials (width B)
    cont = jnp.concatenate([jnp.array([False]), h[1:] == t[:-1]])
    internal = jnp.any(sdb[:, 1:] != sdb[:, :-1], axis=1)
    flag = internal | ~cont

    scanned = _hillis_seg_scan(ops, T, flag)
    C = ops.select(cont, _roll(scanned, 1), ops.infinity((B,)))

    fr = sdb == h[:, None]  # first-run mask (sorted => contiguous prefix)
    return scan, C, fr, sdb


def _bucket_phase(ops, buckets, nbuckets: int, K2: int):
    """sum_{j>=1} j * B_j via suffix sums, rake-style; width-1 result.

    Runs entirely on the complete projective ops (``c_*``): suffix-sum
    plateaus from empty buckets systematically produce equal/identity
    operands, which the branchless RCB formulas handle with no
    case analysis (and at ~half the graph size of the Jacobian
    add_complete composite).  ``buckets`` must already be in the complete
    representation (``ops.j2c``)."""
    B2 = nbuckets // K2
    rev = tuple(jnp.flip(b, axis=-1) for b in buckets)  # suffix -> prefix
    rb = tuple(b.reshape(b.shape[:-1] + (B2, K2)) for b in rev)

    inf = ops.c_infinity((B2,))
    out0 = tuple(jnp.zeros(i.shape + (K2,), i.dtype) for i in inf)

    def step(k, carry):
        acc, out = carry
        Pk = tuple(
            lax.dynamic_index_in_dim(b, k, axis=b.ndim - 1, keepdims=False)
            for b in rb
        )
        acc = ops.c_add(acc, Pk)
        out = tuple(
            lax.dynamic_update_index_in_dim(o, v, k, axis=o.ndim - 1)
            for o, v in zip(out, acc)
        )
        return (acc, out)

    totals, local = lax.fori_loop(0, K2, step, (inf, out0))

    # exclusive carry of lane totals
    scanned = _hillis_scan(ops, totals, ops.c_add)
    idx2 = jnp.arange(B2)
    carry = ops.select(idx2 >= 1, _roll(scanned, 1), ops.c_infinity((B2,)))

    # S_rev[b2, k] = local[b2, k] + carry[b2]
    S = ops.c_add(local, tuple(c[..., None] for c in carry))

    # W = sum over S_rev[0 .. nbuckets-2]  (drop S_rev[last] = S_0)
    Sf = tuple(s.reshape(s.shape[:-2] + (nbuckets,)) for s in S)
    keep = jnp.arange(nbuckets) != (nbuckets - 1)
    Sf = ops.c_mask_to_infinity(keep, Sf)

    sb = tuple(s.reshape(s.shape[:-1] + (B2, K2)) for s in Sf)

    def sumstep(k, acc):
        Pk = tuple(
            lax.dynamic_index_in_dim(b, k, axis=b.ndim - 1, keepdims=False)
            for b in sb
        )
        return ops.c_add(acc, Pk)

    colsum = lax.fori_loop(0, K2, sumstep, ops.c_infinity((B2,)))
    tot = _hillis_scan(ops, colsum, ops.c_add)
    return tuple(a[..., -1:] for a in tot)


def msm_engine(ops, pts, scalars, n: int, c: int, block: int, bucket_block: int,
               return_jacobian: bool = True, nbits: int = 256):
    """Group-generic Pippenger.  pts: tuple of (*, n) arrays (affine);
    scalars: (nbits/16, n) canonical uint32 limb planes.  Width-1 group
    element (Jacobian by default; ``return_jacobian=False`` keeps the
    complete projective representation, e.g. for cross-device combines)."""
    rounds = nbits // c
    nbuckets = 1 << c
    K = block
    B = n // K
    mask_c = jnp.uint32(nbuckets - 1)

    # Round-invariant row-major point table: gathering (n, C) rows of
    # C*4 contiguous bytes is ~50x faster on TPU than C strided gathers
    # along the minor axis of (C, n) planes (measured: 107 ms -> ~2 ms per
    # round at n=2^21, C=32).  One transpose per MSM, amortized.
    row_counts = [int(np.prod(p.shape[:-1])) for p in pts]
    PT = jnp.concatenate([p.reshape(-1, n) for p in pts], axis=0).T  # (n, C)

    def gather_points(perm):
        SPt = jnp.take(PT, perm, axis=0).T  # (C, n)
        out, ofs = [], 0
        for p, cnt in zip(pts, row_counts):
            out.append(SPt[ofs:ofs + cnt].reshape(p.shape[:-1] + (n,)))
            ofs += cnt
        return tuple(out)

    def round_body(r, acc):
        acc = ops.c_dbl_n(acc, c)

        ri = rounds - 1 - r  # digit index from LSB
        limb_idx = (c * ri) // 16
        shift = (c * ri) % 16
        limb_row = lax.dynamic_index_in_dim(scalars, limb_idx, axis=0, keepdims=False)
        d = (limb_row >> jnp.uint32(shift)) & mask_c  # (n,)

        perm = jnp.argsort(d)
        sd = jnp.take(d, perm)
        spts = gather_points(perm)

        scan, C, fr, sdb = _rake_segment_scan(ops, sd, spts, B, K)

        # global tail mask
        tail = jnp.concatenate([sd[1:] != sd[:-1], jnp.array([True])])
        tailb = tail.reshape(B, K)

        # scatter (a): tails not in the first run of their block
        vals_flat = tuple(s.reshape(s.shape[:-2] + (n,)) for s in scan)
        fr_flat = fr.reshape(n)
        idx_a = jnp.where(tail & ~fr_flat & (sd > 0), sd, nbuckets)
        buckets = ops.infinity((nbuckets,))
        buckets = tuple(
            b.at[..., idx_a].set(v, mode="drop")
            for b, v in zip(buckets, vals_flat)
        )

        # scatter (b): first-run tails, corrected by the incoming carry
        count = jnp.sum(fr, axis=1)  # first-run length per block (>= 1)
        kstar = count - 1
        bidx = jnp.arange(B)
        first_tail_val = tuple(s[..., bidx, kstar] for s in scan)
        corrected = ops.add_unsafe(first_tail_val, C)
        h = sdb[:, 0]
        is_tail_b = tailb[bidx, kstar]
        idx_b = jnp.where(is_tail_b & (h > 0), h, nbuckets)
        buckets = tuple(
            b.at[..., idx_b].set(v, mode="drop")
            for b, v in zip(buckets, corrected)
        )

        W = _bucket_phase(ops, ops.j2c(buckets), nbuckets, bucket_block)
        return ops.c_add(acc, W)

    acc0 = ops.c_infinity((1,))
    acc = lax.fori_loop(0, rounds, round_body, acc0)
    return ops.c2j(acc) if return_jacobian else acc


@functools.partial(
    jax.jit, static_argnames=("curve", "n", "c", "block", "bucket_block", "glv")
)
def _msm_jit(X, Y, scalars, curve: CurveSpec, n, c, block, bucket_block,
             glv=False):
    ops = JacobianOps(curve)
    if glv:
        from . import glv as glv_mod

        (X, Y), scalars = glv_mod.glv_table((X, Y), scalars, curve)
        return msm_engine(ops, (X, Y), scalars, 2 * n, c, block, bucket_block,
                          nbits=128)
    return msm_engine(ops, (X, Y), scalars, n, c, block, bucket_block)


def msm(points, scalars, curve: CurveSpec, config: MSMConfig | None = None):
    """Multi-scalar multiplication.

    points: (X, Y) affine Montgomery limb planes (L, n), all finite and
            pairwise linearly independent (prover SRS contract, matching the
            reference's pippenger_unsafe requirements).
    scalars: (L, n) canonical (non-Montgomery) uint32 limb planes.
    Returns a width-1 Jacobian point tuple.
    """
    from . import glv as glv_mod

    X, Y = points
    n = X.shape[1]
    if config is None:
        config = default_config(n)
    use_glv = config.glv and glv_mod.glv_params(curve) is not None
    K = config.block
    # with GLV the engine sees 2n entries; keep 2n a multiple of K with >= 2
    # rake lanes
    eff = 2 if use_glv else 1
    pad = (-(eff * n)) % K
    if pad or (eff * n) // K < 2:
        extra = pad if (eff * n) // K >= 2 else pad + K
        extra = -(-extra // eff)  # pad in table-input units
        Xp = jnp.concatenate([X, jnp.tile(X[:, :1], (1, extra))], axis=1)
        Yp = jnp.concatenate([Y, jnp.tile(Y[:, :1], (1, extra))], axis=1)
        sp = jnp.concatenate(
            [scalars, jnp.zeros((scalars.shape[0], extra), jnp.uint32)], axis=1
        )
        X, Y, scalars, n = Xp, Yp, sp, n + extra
        if (-(eff * n)) % K:  # odd eff-pad rounding; top up one more K
            return msm((X, Y), scalars, curve, config)
    return _msm_jit(
        X, Y, scalars, curve, n, config.c, config.block, config.bucket_block,
        use_glv,
    )
