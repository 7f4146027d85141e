"""BN254 optimal-ate pairing — pure-Python host code (verifier-only).

TPU-native role split (ref: ecc/curves/bn254/pairing_impl.hpp): the pairing
runs once per proof over two points, so it lives on the host as big-int
Python.  The implementation embeds G2 into E(Fq12) through the D-type twist
(w^2 = v, v^3 = xi = 9+u) and runs the standard optimal-ate Miller loop with
loop count 6x+2, the two Frobenius line additions, and the final
exponentiation (p^12-1)/r.

``pairing_batch([(P_i, Q_i)])`` multiplies Miller-loop outputs before a single
final exponentiation — the verifier's 2-pairing check
(ref: plonk/proof_system/verifier/verifier.cpp:219) costs ~1 final exp.

Also hosts the small host-side G1 group (int affine coordinates) used by the
verifier's O(20)-point MSM.
"""

from __future__ import annotations

from ..ff.bn254 import FQ_MOD as P, FR_MOD as R
from . import tower
from .tower import (
    F2_ONE,
    F2_ZERO,
    F6_ZERO,
    F6_ONE,
    F12_ONE,
    f2_add,
    f2_inv,
    f2_mul,
    f2_neg,
    f2_sub,
    f6_add,
    f6_inv,
    f6_mul,
    f6_mul_by_v,
    f6_neg,
    f6_sub,
    f12_inv,
    f12_mul,
    f12_pow,
    f12_sqr,
)

BN_X = 4965661367192848881
ATE_LOOP_COUNT = 6 * BN_X + 2
FINAL_EXP = (P**12 - 1) // R


# ---- host G1 (affine int coordinates; None = infinity) ----------------------


def g1_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        return g1_dbl(a)
    lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def g1_dbl(a):
    if a is None:
        return None
    x, y = a
    if y == 0:
        return None
    lam = 3 * x * x * pow(2 * y, -1, P) % P
    x3 = (lam * lam - 2 * x) % P
    return (x3, (lam * (x - x3) - y) % P)


def g1_neg(a):
    if a is None:
        return None
    return (a[0], (-a[1]) % P)


def g1_mul(k: int, a):
    k %= R
    acc = None
    while k:
        if k & 1:
            acc = g1_add(acc, a)
        a = g1_dbl(a)
        k >>= 1
    return acc


def g1_msm(pairs):
    """Host MSM over [(scalar, point)] — verifier-sized (tens of points)."""
    acc = None
    for s, pt in pairs:
        acc = g1_add(acc, g1_mul(s, pt))
    return acc


def g1_on_curve(a) -> bool:
    if a is None:
        return True
    x, y = a
    return (y * y - x * x * x - 3) % P == 0


# ---- Fq12 helpers -----------------------------------------------------------


def f12_embed_fq(v: int):
    return (((v % P, 0), F2_ZERO, F2_ZERO), F6_ZERO)


def f12_embed_g1x(v: int):
    return f12_embed_fq(v)


def twist_g2(Q):
    """G2' affine (Fq2 pair) -> E(Fq12) affine. x*w^2, y*w^3 (w^2=v, w^3=vw)."""
    if Q is None:
        return None
    x, y = Q
    X = ((F2_ZERO, x, F2_ZERO), F6_ZERO)
    Y = (F6_ZERO, (F2_ZERO, y, F2_ZERO))
    return (X, Y)


def f12_sub(a, b):
    return (f6_sub(a[0], b[0]), f6_sub(a[1], b[1]))


def f12_add(a, b):
    return (f6_add(a[0], b[0]), f6_add(a[1], b[1]))


def f12_neg(a):
    return (f6_neg(a[0]), f6_neg(a[1]))


def f12_eq(a, b):
    return a == b


F12_ZERO = (F6_ZERO, F6_ZERO)

_FROB_EXP = P  # coordinate-wise x -> x^p


def f12_frobenius(a):
    return f12_pow(a, _FROB_EXP)


# ---- E(Fq12) point ops ------------------------------------------------------


def pt12_dbl(a):
    if a is None:
        return None
    x, y = a
    if y == F12_ZERO:
        return None
    three = f12_embed_fq(3)
    two = f12_embed_fq(2)
    lam = f12_mul(f12_mul(three, f12_mul(x, x)), f12_inv(f12_mul(two, y)))
    x3 = f12_sub(f12_mul(lam, lam), f12_mul(two, x))
    y3 = f12_sub(f12_mul(lam, f12_sub(x, x3)), y)
    return (x3, y3)


def pt12_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if f12_add(y1, y2) == F12_ZERO:
            return None
        return pt12_dbl(a)
    lam = f12_mul(f12_sub(y2, y1), f12_inv(f12_sub(x2, x1)))
    x3 = f12_sub(f12_sub(f12_mul(lam, lam), x1), x2)
    y3 = f12_sub(f12_mul(lam, f12_sub(x1, x3)), y1)
    return (x3, y3)


def pt12_neg(a):
    if a is None:
        return None
    return (a[0], f12_neg(a[1]))


def pt12_frobenius(a):
    if a is None:
        return None
    return (f12_frobenius(a[0]), f12_frobenius(a[1]))


def _linefunc(T, Q, Pt):
    """Line through T, Q evaluated at Pt (all E(Fq12) affine points)."""
    x1, y1 = T
    x2, y2 = Q
    xt, yt = Pt
    if x1 != x2:
        lam = f12_mul(f12_sub(y2, y1), f12_inv(f12_sub(x2, x1)))
        return f12_sub(f12_mul(lam, f12_sub(xt, x1)), f12_sub(yt, y1))
    if y1 == y2:
        three = f12_embed_fq(3)
        two = f12_embed_fq(2)
        lam = f12_mul(f12_mul(three, f12_mul(x1, x1)), f12_inv(f12_mul(two, y1)))
        return f12_sub(f12_mul(lam, f12_sub(xt, x1)), f12_sub(yt, y1))
    return f12_sub(xt, x1)


def miller_loop(Q12, P12):
    """Optimal-ate Miller loop, no final exponentiation."""
    if Q12 is None or P12 is None:
        return F12_ONE
    Rpt = Q12
    f = F12_ONE
    bits = bin(ATE_LOOP_COUNT)[3:]  # skip the leading 1
    for b in bits:
        f = f12_mul(f12_sqr(f), _linefunc(Rpt, Rpt, P12))
        Rpt = pt12_dbl(Rpt)
        if b == "1":
            f = f12_mul(f, _linefunc(Rpt, Q12, P12))
            Rpt = pt12_add(Rpt, Q12)
    Q1 = pt12_frobenius(Q12)
    nQ2 = pt12_neg(pt12_frobenius(Q1))
    f = f12_mul(f, _linefunc(Rpt, Q1, P12))
    Rpt = pt12_add(Rpt, Q1)
    f = f12_mul(f, _linefunc(Rpt, nQ2, P12))
    return f


def embed_g1(Pt):
    if Pt is None:
        return None
    return (f12_embed_fq(Pt[0]), f12_embed_fq(Pt[1]))


def pairing(Pt, Q):
    """e(P in G1 ints, Q in G2 Fq2-affine) with final exponentiation."""
    f = miller_loop(twist_g2(Q), embed_g1(Pt))
    return f12_pow(f, FINAL_EXP)


def pairing_batch(pairs):
    """prod_i e(P_i, Q_i); one shared final exponentiation."""
    f = F12_ONE
    for Pt, Q in pairs:
        f = f12_mul(f, miller_loop(twist_g2(Q), embed_g1(Pt)))
    return f12_pow(f, FINAL_EXP)


def pairing_check(pairs) -> bool:
    """prod e(P_i, Q_i) == 1 (the verifier's final check)."""
    return pairing_batch(pairs) == F12_ONE
