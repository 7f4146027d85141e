"""GLV endomorphism scalar splitting as batched limb-plane kernels.

TPU-native equivalent of the reference's ``split_into_endomorphism_scalars``
(ecc/fields/field.hpp:236-282) + ``generate_pippenger_point_table``
(scalar_multiplication.cpp:104): each 254-bit scalar k splits into
k = k1 + lambda * k2 (mod r) with |k1|, |k2| < 2^128, so the MSM runs HALF
the window rounds over a doubled point table (P_i, phi(P_i)) where
phi(x, y) = (beta * x, y) is the curve endomorphism acting as
multiplication by lambda.

Unlike the reference's per-scalar uint512 arithmetic, the split here is a
fully batched device kernel: Babai rounding against a Gauss-reduced lattice
basis, computed with rectangular schoolbook products on 16-bit limb planes
(the same outer-product + 0/1-matmul formulation as ff/limb._conv_cols) and
two's-complement fixups.  Constants (lattice basis, rounding magics) are
derived from the curve at import time and verified against the curve
generator -- nothing is hard-coded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from ..ff import limb
from ..ff.spec import FieldSpec
from ..curves.spec import CurveSpec
from ..numeric.bigint import int_to_limbs

MASK = jnp.uint32(0xFFFF)
U32 = jnp.uint32

# Babai rounding precision: c_i = (k * m_i + 2^(S-1)) >> S approximates
# round(k * |b_j| / r) with error <= 1 because k < 2^254 << 2^S / |b_j|.
_SHIFT = 416
_SLIMB = _SHIFT // 16  # 26


# --------------------------- host-side setup -------------------------------


def _host_ec_mul(k: int, pt, p: int, b: int):
    """Tiny affine double-and-add over F_p (host verification only)."""

    def add(P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            lam = (3 * x1 * x1) * pow(2 * y1, -1, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        return (x3, (lam * (x1 - x3) - y1) % p)

    acc = None
    while k:
        if k & 1:
            acc = add(acc, pt)
        pt = add(pt, pt)
        k >>= 1
    return acc


def _cube_root(p: int) -> int:
    """A primitive cube root of unity mod p (requires p % 3 == 1)."""
    assert p % 3 == 1
    e = (p - 1) // 3
    g = 2
    while True:
        r = pow(g, e, p)
        if r != 1:
            return r
        g += 1


def _gauss_reduce(u, v):
    """Gauss lattice reduction of a 2D integer basis (shortest vectors)."""

    def norm2(w):
        return w[0] * w[0] + w[1] * w[1]

    while True:
        if norm2(u) > norm2(v):
            u, v = v, u
        n = norm2(u)
        q = round((u[0] * v[0] + u[1] * v[1]) / n)
        if q == 0:
            return u, v
        v = (v[0] - q * u[0], v[1] - q * u[1])


@functools.lru_cache(maxsize=None)
def glv_params(curve: CurveSpec):
    """Derive (lambda, beta, reduced basis, Babai magics) for a curve.

    Returns None when the curve admits no usable GLV split (p or r != 1
    mod 3, or the split bound does not fit 128 bits).
    """
    r = curve.order
    q = curve.field.modulus
    if r % 3 != 1 or q % 3 != 1:
        return None
    lam = _cube_root(r)
    beta = _cube_root(q)
    # Match beta to lam on the generator: phi(G) must equal lam*G; the other
    # cube root pairs with lam^2.
    G = (curve.gen_x, curve.gen_y)
    lamG = _host_ec_mul(lam, G, q, curve.b)
    if lamG != ((beta * G[0]) % q, G[1]):
        beta = pow(beta, 2, q)
        lamG2 = ((beta * G[0]) % q, G[1])
        if lamG != lamG2:
            return None

    # Lattice {(x, y): x + y*lam == 0 mod r}; Babai split vs reduced basis.
    v1, v2 = _gauss_reduce((r, 0), ((-lam) % r, 1))
    a1, b1 = v1
    a2, b2 = v2
    # Babai: k_vec = eps1*v1 + eps2*v2 with |eps_i| <= 1/2 + 2^-100 (nearest
    # rounding; the floor-magic error is folded in), so per coordinate
    # |k1| <= 0.51*(|a1|+|a2|), |k2| <= 0.51*(|b1|+|b2|).
    # reject unless 0.51 * max_coord_sum < 2^128 (the 8-limb output width)
    if max(abs(a1) + abs(a2), abs(b1) + abs(b2)) * 51 >= 100 << 128:
        return None

    det = a1 * b2 - a2 * b1  # = +-r
    assert abs(det) == r
    # c = round(k * (b2, -b1) / det) makes k - c1*v1 - c2*v2 short.  Fold
    # det's sign into the numerators.
    s = 1 if det > 0 else -1
    n1 = s * b2   # c1 = round(k * n1 / r)
    n2 = s * -b1  # c2 = round(k * n2 / r)

    def magic(nv):
        sign = 1 if nv >= 0 else -1
        m = (abs(nv) << _SHIFT) // r  # floor; error folded into bound slack
        return sign, m

    s1m, m1 = magic(n1)
    s2m, m2 = magic(n2)
    return {
        "lam": lam,
        "beta": beta,
        "basis": (v1, v2),
        "c_signs": (s1m, s2m),
        "magics": (m1, m2),
    }


def split_scalar_host(k: int, curve: CurveSpec):
    """Host reference split: k -> (k1, k2) with k = k1 + lam*k2 (mod r)."""
    P = glv_params(curve)
    r = curve.order
    (a1, b1), (a2, b2) = P["basis"]
    (s1m, s2m) = P["c_signs"]
    m1, m2 = P["magics"]
    half = 1 << (_SHIFT - 1)
    c1 = s1m * ((k * m1 + half) >> _SHIFT)
    c2 = s2m * ((k * m2 + half) >> _SHIFT)
    k1 = k - c1 * a1 - c2 * a2
    k2 = -(c1 * b1 + c2 * b2)
    assert (k1 + P["lam"] * k2 - k) % r == 0
    return k1, k2


# --------------------------- device kernels --------------------------------


@functools.lru_cache(maxsize=None)
def _rect_conv_mat(La: int, Lb: int, out_cols: int):
    """0/1 reduction matrix for a rectangular schoolbook product."""
    i = np.arange(La)[:, None]
    j = np.arange(Lb)[None, :]
    s = (i + j).reshape(-1)
    C = np.zeros((out_cols, 2 * La * Lb), np.float32)
    for k in range(out_cols):
        C[k, : La * Lb] = s == k
        C[k, La * Lb :] = s == k - 1
    return C

def _rect_mul_cols(a, b_limbs: np.ndarray, out_cols: int):
    """a (La, *batch) canonical x constant b -> redundant columns.

    Same exact-f32 outer-product formulation as ff/limb._conv_cols, but
    rectangular and with a host-constant operand."""
    La = a.shape[0]
    Lb = len(b_limbs)
    bshape = a.shape[1:]
    bc = limb.const(np.asarray(b_limbs, np.uint32), a.ndim)
    P = a[:, None] * bc[None, :]  # (La, Lb, *batch)
    P = jnp.broadcast_to(P, (La, Lb) + bshape)
    Pf = P.reshape((La * Lb, -1))
    V = jnp.concatenate([Pf & MASK, Pf >> 16], axis=0).astype(jnp.float32)
    C = jnp.asarray(_rect_conv_mat(La, Lb, out_cols))
    cols = lax.dot_general(
        C, V, (((1,), (0,)), ((), ())), precision=lax.Precision.HIGHEST
    )
    return cols.astype(U32).reshape((out_cols,) + bshape)


def _neg2c(x):
    """Two's-complement negation of canonical planes (mod 2^(16*W))."""
    one = jnp.zeros((x.shape[0],) + (1,) * (x.ndim - 1), U32).at[0].set(1)
    y, _ = limb.canon((MASK - x) + one)
    return y


def _sub2c(x, y):
    """x - y mod 2^(16*W) on canonical planes."""
    one = jnp.zeros((x.shape[0],) + (1,) * (x.ndim - 1), U32).at[0].set(1)
    z, _ = limb.canon(x + (MASK - y) + one)
    return z


_W = 10  # two's-complement workspace limbs (160 bits; |k_i| < 2^128)


def glv_split(scalars, curve: CurveSpec):
    """Batched split: (16, n) canonical scalar planes ->
    (k1_abs (8, n), neg1 (n,), k2_abs (8, n), neg2 (n,))."""
    P = glv_params(curve)
    (a1, b1), (a2, b2) = P["basis"]
    s1m, s2m = P["c_signs"]
    m1, m2 = P["magics"]

    def babai_c(m):
        Lb = max((m.bit_length() + 15) // 16, 1)
        out_cols = _SLIMB + 9  # product < 2^(254 + len(m)); c < 2^128
        cols = _rect_mul_cols(scalars, int_to_limbs(m, Lb), out_cols)
        half = np.zeros((out_cols,), np.uint32)
        half[_SLIMB - 1] = 0x8000  # + 2^(S-1): round-to-nearest
        cols = cols + limb.const(half, cols.ndim)
        c, _ = limb.canon(cols)
        return c[_SLIMB:_SLIMB + 8]  # (8, n)

    c1 = babai_c(m1)
    c2 = babai_c(m2)

    def term(c, coeff: int, csign: int):
        """(csign*c) * coeff mod 2^(16*_W), as canonical planes."""
        sgn = csign * (1 if coeff >= 0 else -1)
        mag = abs(coeff)
        Lb = max((mag.bit_length() + 15) // 16, 1)
        cols = _rect_mul_cols(c, int_to_limbs(mag, Lb), _W)
        v, _ = limb.canon(cols)
        return v, sgn

    def acc(base, terms):
        v = base
        for t, sgn in terms:
            v = _sub2c(v, t) if sgn > 0 else (limb.canon(v + t)[0])
        return v

    k_low = scalars[:_W]
    # k1 = k - (s1m*c1)*a1 - (s2m*c2)*a2
    k1 = acc(k_low, [term(c1, a1, s1m), term(c2, a2, s2m)])
    # k2 = -((s1m*c1)*b1 + (s2m*c2)*b2) = 0 - t1 - t2
    zero = jnp.zeros_like(k_low)
    k2 = acc(zero, [term(c1, b1, s1m), term(c2, b2, s2m)])

    def abs_split(v):
        neg = (v[_W - 1] >> 15) != 0
        mag = limb.select(neg, _neg2c(v), v)
        return mag[:8], neg

    k1a, n1 = abs_split(k1)
    k2a, n2 = abs_split(k2)
    return k1a, n1, k2a, n2


def endo_table(points, curve: CurveSpec):
    """(X, Y) (L, n) Montgomery planes -> endo X plane (beta * X)."""
    P = glv_params(curve)
    fq = curve.field
    beta_m = limb.const(
        int_to_limbs(fq.to_mont_int(P["beta"]), fq.nlimbs), points[0].ndim
    )
    X, Y = points
    from ..ff import pallas_field as pf

    if pf.use_pallas():
        return pf.mont_mul(X, jnp.broadcast_to(beta_m, X.shape), fq)
    Xe = limb.mont_mul(X, jnp.broadcast_to(beta_m, X.shape), fq)
    return Xe


def glv_table(points, scalars, curve: CurveSpec):
    """Build the doubled GLV point table + 128-bit scalar planes.

    (X, Y) (L, n) Montgomery affine planes, scalars (16, n) canonical ->
    ((X', Y') (L, 2n), scalars' (8, 2n)) such that
    sum scalars'_i * P'_i == sum scalars_i * P_i.  Negative split halves are
    folded into the point table by negating y (the reference's
    (P, beta*x, -y) table, scalar_multiplication.cpp:104, generalized to
    per-scalar signs instead of a global skew convention).
    """
    X, Y = points
    fq = curve.field
    k1a, n1, k2a, n2 = glv_split(scalars, curve)
    Xe = endo_table(points, curve)
    Yn = limb.neg_mod(Y, fq)
    Y1 = limb.select(n1, Yn, Y)
    Y2 = limb.select(n2, Yn, Y)
    Xt = jnp.concatenate([X, Xe], axis=-1)
    Yt = jnp.concatenate([Y1, Y2], axis=-1)
    st = jnp.concatenate([k1a, k2a], axis=-1)
    return (Xt, Yt), st
