"""BN254 extension-field tower and G2 — pure-Python (host/verifier side).

The prover never touches Fq2/Fq6/Fq12: the tower is only needed for the
verifier's pairing check and SRS [x]_2 handling (ref:
ecc/curves/bn254/fq2.hpp, fq6.hpp, fq12.hpp, g2.hpp, pairing_impl.hpp).
Verification is O(1) per proof, so host Python big-int arithmetic is the
right tool — no limb kernels required.

Tower (matching the reference):
  Fq2  = Fq[u]  / (u^2 + 1)
  Fq6  = Fq2[v] / (v^3 - xi),  xi = 9 + u
  Fq12 = Fq6[w] / (w^2 - v)

G2: y^2 = x^3 + b/xi over Fq2 (D-type twist).
Elements: Fq2 = (c0, c1) int tuples; Fq6 = 3-tuples of Fq2; Fq12 = 2-tuples
of Fq6.
"""

from __future__ import annotations

from ..ff.bn254 import FQ_MOD as P

# ---- Fq2 ------------------------------------------------------------------

XI = (9, 1)  # 9 + u


def f2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def f2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def f2_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def f2_mul(a, b):
    t0 = a[0] * b[0] % P
    t1 = a[1] * b[1] % P
    return ((t0 - t1) % P, ((a[0] + a[1]) * (b[0] + b[1]) - t0 - t1) % P)


def f2_sqr(a):
    t0 = (a[0] + a[1]) % P
    t1 = (a[0] - a[1]) % P
    return (t0 * t1 % P, 2 * a[0] * a[1] % P)


def f2_muls(a, s: int):
    return (a[0] * s % P, a[1] * s % P)


def f2_inv(a):
    d = pow((a[0] * a[0] + a[1] * a[1]) % P, -1, P)
    return (a[0] * d % P, (-a[1]) * d % P)


def f2_conj(a):
    return (a[0], (-a[1]) % P)


F2_ZERO = (0, 0)
F2_ONE = (1, 0)

# twist constant b' = 3 / xi
TWIST_B = f2_mul((3, 0), f2_inv(XI))

# G2 generator (standard alt_bn128 values; cross-checked against the
# reference's Montgomery constants in tests/test_tower.py)
G2_GEN = (
    (
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    (
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)


def g2_is_on_curve(Q):
    if Q is None:
        return True
    x, y = Q
    return f2_sub(f2_sqr(y), f2_add(f2_mul(f2_sqr(x), x), TWIST_B)) == F2_ZERO


def g2_add(Pt, Q):
    if Pt is None:
        return Q
    if Q is None:
        return Pt
    x1, y1 = Pt
    x2, y2 = Q
    if x1 == x2:
        if f2_add(y1, y2) == F2_ZERO:
            return None
        return g2_dbl(Pt)
    lam = f2_mul(f2_sub(y2, y1), f2_inv(f2_sub(x2, x1)))
    x3 = f2_sub(f2_sub(f2_sqr(lam), x1), x2)
    y3 = f2_sub(f2_mul(lam, f2_sub(x1, x3)), y1)
    return (x3, y3)


def g2_dbl(Pt):
    if Pt is None:
        return None
    x, y = Pt
    if y == F2_ZERO:
        return None
    lam = f2_mul(f2_muls(f2_sqr(x), 3), f2_inv(f2_muls(y, 2)))
    x3 = f2_sub(f2_sqr(lam), f2_muls(x, 2))
    y3 = f2_sub(f2_mul(lam, f2_sub(x, x3)), y)
    return (x3, y3)


def g2_neg(Pt):
    if Pt is None:
        return None
    return (Pt[0], f2_neg(Pt[1]))


def g2_mul(k: int, Pt):
    acc = None
    while k:
        if k & 1:
            acc = g2_add(acc, Pt)
        Pt = g2_dbl(Pt)
        k >>= 1
    return acc


# ---- Fq6 = Fq2[v]/(v^3 - xi) ----------------------------------------------

F6_ZERO = (F2_ZERO, F2_ZERO, F2_ZERO)
F6_ONE = (F2_ONE, F2_ZERO, F2_ZERO)


def f6_add(a, b):
    return tuple(f2_add(x, y) for x, y in zip(a, b))


def f6_sub(a, b):
    return tuple(f2_sub(x, y) for x, y in zip(a, b))


def f6_neg(a):
    return tuple(f2_neg(x) for x in a)


def _mul_xi(a):
    return f2_mul(a, XI)


def f6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = f2_mul(a0, b0)
    t1 = f2_mul(a1, b1)
    t2 = f2_mul(a2, b2)
    c0 = f2_add(t0, _mul_xi(f2_sub(f2_mul(f2_add(a1, a2), f2_add(b1, b2)), f2_add(t1, t2))))
    c1 = f2_add(f2_sub(f2_mul(f2_add(a0, a1), f2_add(b0, b1)), f2_add(t0, t1)), _mul_xi(t2))
    c2 = f2_add(f2_sub(f2_mul(f2_add(a0, a2), f2_add(b0, b2)), f2_add(t0, t2)), t1)
    return (c0, c1, c2)


def f6_sqr(a):
    return f6_mul(a, a)


def f6_mul_by_v(a):
    return (_mul_xi(a[2]), a[0], a[1])


def f6_inv(a):
    a0, a1, a2 = a
    c0 = f2_sub(f2_sqr(a0), _mul_xi(f2_mul(a1, a2)))
    c1 = f2_sub(_mul_xi(f2_sqr(a2)), f2_mul(a0, a1))
    c2 = f2_sub(f2_sqr(a1), f2_mul(a0, a2))
    t = f2_inv(
        f2_add(
            f2_add(f2_mul(a0, c0), _mul_xi(f2_mul(a2, c1))),
            _mul_xi(f2_mul(a1, c2)),
        )
    )
    return (f2_mul(c0, t), f2_mul(c1, t), f2_mul(c2, t))


# ---- Fq12 = Fq6[w]/(w^2 - v) -----------------------------------------------

F12_ONE = (F6_ONE, F6_ZERO)


def f12_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = f6_mul(a0, b0)
    t1 = f6_mul(a1, b1)
    c0 = f6_add(t0, f6_mul_by_v(t1))
    c1 = f6_sub(f6_mul(f6_add(a0, a1), f6_add(b0, b1)), f6_add(t0, t1))
    return (c0, c1)


def f12_sqr(a):
    return f12_mul(a, a)


def f12_conj(a):
    return (a[0], f6_neg(a[1]))


def f12_inv(a):
    a0, a1 = a
    t = f6_inv(f6_sub(f6_sqr(a0), f6_mul_by_v(f6_sqr(a1))))
    return (f6_mul(a0, t), f6_neg(f6_mul(a1, t)))


def f12_pow(a, e: int):
    out = F12_ONE
    while e:
        if e & 1:
            out = f12_mul(out, a)
        a = f12_sqr(a)
        e >>= 1
    return out
