"""Vectorized modular arithmetic on 16-bit limb planes (JAX, uint32 only).

TPU-native re-design of the reference's Montgomery field arithmetic
(ecc/fields/field_impl_x64.hpp MULX/ADOX kernels; field.hpp:404-426 lazy
reduction).  TPUs have no scalar 64-bit ALU and no 32x32->64 multiply, so a
field element batch is a uint32 array of shape ``(L, *batch)`` holding L=16
little-endian 16-bit digits ("limb planes"): every op is a fused batch of
VPU int32 ops, and all carry chains are O(log L) Kogge-Stone scans
(``lax.associative_scan`` over generate/propagate bits) instead of the
reference's sequential ADCX chains.

Montgomery multiplication uses the *separated* REDC formulation
(T = a*b; m = T*p' mod R; t = (T + m*p)/R) rather than CIOS: separated REDC
has no per-limb sequential dependency, which matters far more on a vector
machine than the extra low product it costs.

All functions are pure and jit-friendly; ``spec`` arguments are static
(FieldSpec dataclasses hashable by id via closure or partial).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from .spec import FieldSpec

MASK = jnp.uint32(0xFFFF)
U32 = jnp.uint32


def const(limbs: np.ndarray, ndim: int) -> jnp.ndarray:
    """Reshape an (L,) constant for broadcasting against (L, *batch)."""
    return jnp.asarray(limbs, U32).reshape(limbs.shape + (1,) * (ndim - 1))


import os

_CARRY_IMPL = os.environ.get("AZTEC_CARRY", "scan")
_CONV_IMPL = os.environ.get("AZTEC_CONV", "dot")


def _carry_scan(gen, prop):
    """Kogge-Stone carry resolution: carry-out[k] of limbs 0..k given cin=0.

    Two equivalent formulations (AZTEC_CARRY): 'ks' hand-rolls a
    Hillis-Steele over the limb axis (log2(L) static pad+shift+logic
    steps); 'scan' uses lax.associative_scan's odd/even recursion."""
    if _CARRY_IMPL == "scan":
        def comb(a, b):
            ag, ap = a
            bg, bp = b
            return (bg | (bp & ag), ap & bp)

        G, _ = lax.associative_scan(comb, (gen, prop), axis=0)
        return G

    G, P = gen, prop
    L = G.shape[0]
    d = 1
    while d < L:
        # shift down by d along the limb axis; shifted-in identity = (0, 1)
        Gs = jnp.concatenate([jnp.zeros_like(G[:d]), G[:-d]], axis=0)
        Ps = jnp.concatenate([jnp.ones_like(P[:d]), P[:-d]], axis=0)
        G = G | (P & Gs)
        P = P & Ps
        d *= 2
    return G


def canon(cols: jnp.ndarray):
    """Canonicalize redundant columns to 16-bit limbs.

    ``cols``: uint32 (K, *batch), each column any value < 2**32; represents
    sum_k cols[k] << (16 k).  Returns ``(limbs, carry_out)`` where limbs are
    canonical (< 2**16) and ``carry_out`` (uint32, (*batch)) is the value
    shifted out beyond 16*K bits.
    """
    d = cols & MASK
    g = cols >> 16
    zero_row = jnp.zeros_like(g[:1])
    e = d + jnp.concatenate([zero_row, g[:-1]], axis=0)  # < 2**17
    base = e & MASK
    gen = (e >> 16).astype(jnp.bool_)  # 0/1
    prop = base == MASK
    G = _carry_scan(gen, prop)
    cin = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    out = (base + cin.astype(U32)) & MASK
    carry_out = g[-1] + G[-1].astype(U32)
    return out, carry_out


def cond_sub_p(x: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """x in [0, 2p) canonical -> x mod p."""
    comp = const(spec.comp_p_limbs, x.ndim)
    y, co = canon(x + comp)
    return jnp.where((co != 0)[None], y, x)


def add_mod(a, b, spec: FieldSpec):
    s, _ = canon(a + b)
    return cond_sub_p(s, spec)


def sub_mod(a, b, spec: FieldSpec):
    cols = a + (MASK - b)
    one = jnp.zeros((cols.shape[0], 1), U32).at[0, 0].set(1)
    one = one.reshape((cols.shape[0],) + (1,) * (cols.ndim - 1))
    z, co = canon(cols + one)
    p = const(spec.p_limbs, a.ndim)
    addp = jnp.where((co == 0)[None], p, jnp.zeros_like(p))
    r, _ = canon(z + addp)
    return r


def neg_mod(a, spec: FieldSpec):
    return sub_mod(jnp.zeros_like(a), a, spec)


@functools.lru_cache(maxsize=None)
def _conv_mat(L: int, out_cols: int):
    """0/1 reduction matrix turning the flattened (lo, hi) outer-product
    planes into schoolbook columns: C[k, i*L+j] = [i+j == k] for the low
    halves and C[k, L*L + i*L+j] = [i+j+1 == k] for the high halves."""
    i = np.arange(L)[:, None]
    j = np.arange(L)[None, :]
    s = (i + j).reshape(-1)
    C = np.zeros((out_cols, 2 * L * L), np.float32)
    for k in range(out_cols):
        C[k, : L * L] = s == k
        C[k, L * L :] = s == k - 1
    return C


def _conv_cols(a, b, L: int, out_cols: int):
    """Redundant schoolbook columns of a*b: cols[k] = sum_{i+j=k} lo(a_i b_j)
    + sum_{i+j=k-1} hi(a_i b_j), each column < 2**21.

    a, b: (L, *batch) canonical (< 2**16) limb planes; returns uint32
    (out_cols, *batch).  Two formulations (AZTEC_CONV):

    - 'dot': outer product, then ONE dense matmul against the constant 0/1
      reduction matrix.  Exact in f32 at HIGHEST precision (operands are
      0/1 or < 2**16; every column sums <= 32 terms, so products and
      accumulations stay below 2**24).  On TPU the reduction rides the
      MXU; ~10 HLO ops per multiply.
    - 'pad': shifted-pad tree reduction — 2L static concats aligning each
      outer-product row with its output column plus one stacked sum; pure
      VPU int32, no f32 round-trips.

    Both replace the original unrolled schoolbook scatter-add loop, whose
    64 dynamic-update-slices per multiply made every field op ~1.7k HLO
    ops and pushed whole-prover XLA compiles into minutes."""
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    P = a[:, None] * b[None, :]  # (L, L, *batch) exact 32-bit products
    P = jnp.broadcast_to(P, (L, L) + bshape)
    if _CONV_IMPL == "dot":
        Pf = P.reshape((L * L, -1))
        V = jnp.concatenate([Pf & MASK, Pf >> 16], axis=0).astype(jnp.float32)
        C = jnp.asarray(_conv_mat(L, out_cols))
        cols = lax.dot_general(
            C, V, (((1,), (0,)), ((), ())), precision=lax.Precision.HIGHEST
        )
        return cols.astype(U32).reshape((out_cols,) + bshape)
    lo = P & MASK
    hi = P >> 16
    rows = []
    for i in range(L):
        zf = jnp.zeros((i,) + bshape, U32)
        zb = jnp.zeros((max(out_cols - L - i, 0),) + bshape, U32)
        rows.append(jnp.concatenate([zf, lo[i][: out_cols - i], zb], axis=0))
        zf1 = jnp.zeros((i + 1,) + bshape, U32)
        zb1 = jnp.zeros((max(out_cols - L - i - 1, 0),) + bshape, U32)
        if out_cols - i - 1 > 0:
            rows.append(
                jnp.concatenate([zf1, hi[i][: out_cols - i - 1], zb1], axis=0)
            )
    return jnp.sum(jnp.stack(rows, axis=0), axis=0)


def _mul_full(a, b, L: int):
    """Schoolbook product -> 2L redundant columns (each < 2**21)."""
    return _conv_cols(a, b, L, 2 * L)


def _mul_lo(a, b, L: int):
    """Low L columns of the schoolbook product (redundant, < 2**21)."""
    return _conv_cols(a, b, L, L)


def mont_mul(a, b, spec: FieldSpec):
    """Montgomery product REDC(a*b); inputs/outputs canonical, < p."""
    L = spec.nlimbs
    ndim = max(a.ndim, b.ndim)
    T = _mul_full(a, b, L)  # (2L,) redundant
    Tlow, c16 = canon(T[:L])
    Thi = T[L:].at[0].add(c16)
    pprime = const(spec.pprime_limbs, ndim)
    m, _ = canon(_mul_lo(Tlow, pprime, L))
    p = const(spec.p_limbs, ndim)
    MP = _mul_full(m, p, L)  # (2L,) redundant
    U = jnp.concatenate([Tlow, Thi], axis=0) + MP  # cols < 2**22
    Uc, _ = canon(U)
    t = Uc[L:]
    return cond_sub_p(t, spec)


def mont_sqr(a, spec: FieldSpec):
    return mont_mul(a, a, spec)


def to_mont(a, spec: FieldSpec):
    return mont_mul(a, const(spec.r2_limbs, a.ndim), spec)


def from_mont(a, spec: FieldSpec):
    one = jnp.zeros_like(a).at[0].set(jnp.broadcast_to(jnp.uint32(1), a.shape[1:]))
    return mont_mul(a, one, spec)


def zeros_like_elem(a):
    return jnp.zeros_like(a)


def one_mont(spec: FieldSpec, batch_shape=(), ndim=None):
    nd = 1 + len(batch_shape)
    c = const(spec.one_mont_limbs, nd)
    return jnp.broadcast_to(c, (spec.nlimbs,) + tuple(batch_shape))


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


def select(mask, a, b):
    """mask: (*batch) bool; elementwise field select."""
    return jnp.where(mask[None], a, b)


def mont_pow(a, exp_bits, spec: FieldSpec):
    """a^e with e given as (nbits,) uint32 LSB-first bit array (static-length).

    Runs as a lax.scan of square-and-multiply steps: small graph, sequential
    in the exponent but fully batched across elements.
    """
    bits = jnp.asarray(exp_bits, U32)
    one = jnp.broadcast_to(const(spec.one_mont_limbs, a.ndim), a.shape)

    def step(carry, bit):
        result, base = carry
        r2 = mont_mul(result, base, spec)
        result = jnp.where((bit != 0), r2, result)
        base = mont_sqr(base, spec)
        return (result, base), None

    (res, _), _ = lax.scan(step, (one, a), bits)
    return res


def inv_mont(a, spec: FieldSpec):
    """Fermat inversion (Montgomery form in/out); maps 0 -> 0."""
    return mont_pow(a, spec.inv_exp_bits, spec)


def batch_inv_mont(a, spec: FieldSpec, axis: int = -1):
    """Montgomery-trick batch inversion along one batch axis.

    Vectorized form of the reference's batch_invert (field.hpp:166): prefix
    and suffix products via associative scans (log depth) + ONE Fermat
    inversion of the total, then two elementwise products.  Zeros map to zero.
    """
    axis = axis % a.ndim
    if axis == 0:
        raise ValueError("axis 0 is the limb axis")
    zero_mask = is_zero(a)  # (*batch)
    one = jnp.broadcast_to(const(spec.one_mont_limbs, a.ndim), a.shape)
    x = jnp.where(zero_mask[None], one, a)

    mul = lambda u, v: mont_mul(u, v, spec)
    prefix = lax.associative_scan(mul, x, axis=axis)
    suffix = lax.associative_scan(mul, x, axis=axis, reverse=True)

    n = a.shape[axis]
    total = lax.index_in_dim(prefix, n - 1, axis=axis, keepdims=True)
    tinv = inv_mont(total, spec)

    # inv_i = prefix_{i-1} * suffix_{i+1} * tinv  (with empty products = 1)
    pad = jnp.broadcast_to(
        const(spec.one_mont_limbs, a.ndim),
        a.shape[:axis] + (1,) + a.shape[axis + 1 :],
    )
    pl = jnp.concatenate(
        [pad, lax.slice_in_dim(prefix, 0, n - 1, axis=axis)], axis=axis
    )
    sr = jnp.concatenate(
        [lax.slice_in_dim(suffix, 1, n, axis=axis), pad], axis=axis
    )
    out = mul(mul(pl, sr), jnp.broadcast_to(tinv, a.shape))
    return jnp.where(zero_mask[None], jnp.zeros_like(a), out)


# -- convenience jitted entry points (spec static) -------------------------

@functools.partial(jax.jit, static_argnames=("spec",))
def jit_mont_mul(a, b, spec):
    return mont_mul(a, b, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def jit_add_mod(a, b, spec):
    return add_mod(a, b, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def jit_sub_mod(a, b, spec):
    return sub_mod(a, b, spec)


# -- eager-call consolidation (round 5) ------------------------------------
# Rebind the public elementwise entry points to jitted versions: an EAGER
# limb op expands through canon's Kogge-Stone carry scan into ~30 tiny
# primitive compiles PER NEW SHAPE (measured: 2500+ sub-second compiles
# during one cold 2^17 prove, ~0.45 s each over the tunneled backend, and
# sub-threshold for the old persistent-cache cutoff).  One jitted
# executable per (op, shape) replaces them and persists in the cache.
# Internal/jitted callers are unaffected (nested jit is inlined).

_raw_cond_sub_p = cond_sub_p
cond_sub_p = jax.jit(_raw_cond_sub_p, static_argnums=(1,))
_raw_add_mod = add_mod
add_mod = jax.jit(_raw_add_mod, static_argnums=(2,))
_raw_sub_mod = sub_mod
sub_mod = jax.jit(_raw_sub_mod, static_argnums=(2,))
_raw_neg_mod = neg_mod
neg_mod = jax.jit(_raw_neg_mod, static_argnums=(1,))
_raw_mont_mul = mont_mul
mont_mul = jax.jit(_raw_mont_mul, static_argnums=(2,))
_raw_mont_sqr = mont_sqr
mont_sqr = jax.jit(_raw_mont_sqr, static_argnums=(1,))
_raw_to_mont = to_mont
to_mont = jax.jit(_raw_to_mont, static_argnums=(1,))
_raw_from_mont = from_mont
from_mont = jax.jit(_raw_from_mont, static_argnums=(1,))
_raw_batch_inv_mont = batch_inv_mont
batch_inv_mont = jax.jit(_raw_batch_inv_mont, static_argnums=(1, 2))
