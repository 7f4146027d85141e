"""Batched Jacobian/affine group kernels on limb planes (short Weierstrass, a=0).

TPU-native re-design of the reference's group element ops
(ecc/groups/element.hpp, group_impl_asm.tcc): every function operates on a
whole batch of points at once; points are tuples of Montgomery-form uint32
limb planes.

Representations:
- Jacobian: (X, Y, Z) with Z == 0 encoding the point at infinity.
- Affine: (x, y); infinity is not representable (SRS/bucket inputs are
  finite; use Jacobian wherever infinity can occur).

Variants mirror the reference's safety split (scalar_multiplication.cpp:923
``pippenger_unsafe``): ``add_unsafe``/``mixed_add_unsafe`` assume P != +-Q
(linearly-independent prover inputs) but fully handle infinities;
``add_complete`` additionally resolves P == +-Q via a fused double + select.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ff import limb
from ..ff.spec import FieldSpec


def _ops(spec: FieldSpec):
    add = lambda a, b: limb.add_mod(a, b, spec)
    sub = lambda a, b: limb.sub_mod(a, b, spec)
    mul = lambda a, b: limb.mont_mul(a, b, spec)
    sqr = lambda a: limb.mont_mul(a, a, spec)
    return add, sub, mul, sqr


def dbl(P, spec: FieldSpec):
    """Jacobian doubling (a=0): 2M + 5S.  Infinity (Z=0) maps to infinity."""
    X, Y, Z = P
    add, sub, mul, sqr = _ops(spec)
    A = sqr(X)
    B = sqr(Y)
    C = sqr(B)
    t = sqr(add(X, B))
    D = sub(sub(t, A), C)
    D = add(D, D)  # 2((X+B)^2 - A - C)
    E = add(add(A, A), A)  # 3A
    F = sqr(E)
    X3 = sub(F, add(D, D))
    C2 = add(C, C)
    C4 = add(C2, C2)
    C8 = add(C4, C4)
    Y3 = sub(mul(E, sub(D, X3)), C8)
    Z3 = mul(add(Y, Y), Z)
    return (X3, Y3, Z3)


def add_unsafe(P, Q, spec: FieldSpec):
    """Jacobian + Jacobian (11M + 5S): assumes P != +-Q when both finite."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    add, sub, mul, sqr = _ops(spec)
    Z1Z1 = sqr(Z1)
    Z2Z2 = sqr(Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(mul(Y1, Z2), Z2Z2)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = sub(U2, U1)
    H2 = add(H, H)
    I = sqr(H2)
    J = mul(H, I)
    r = sub(S2, S1)
    r = add(r, r)
    V = mul(U1, I)
    r2 = sqr(r)
    X3 = sub(sub(r2, J), add(V, V))
    SJ = mul(S1, J)
    Y3 = sub(mul(r, sub(V, X3)), add(SJ, SJ))
    ZZ = sqr(add(Z1, Z2))
    Z3 = mul(sub(sub(ZZ, Z1Z1), Z2Z2), H)
    p_inf = limb.is_zero(Z1)
    q_inf = limb.is_zero(Z2)
    X3 = limb.select(p_inf, X2, limb.select(q_inf, X1, X3))
    Y3 = limb.select(p_inf, Y2, limb.select(q_inf, Y1, Y3))
    Z3 = limb.select(p_inf, Z2, limb.select(q_inf, Z1, Z3))
    return (X3, Y3, Z3)


def add_complete(P, Q, spec: FieldSpec):
    """Jacobian + Jacobian handling all cases (P==Q doubles, P==-Q -> inf)."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    add, sub, mul, sqr = _ops(spec)
    Z1Z1 = sqr(Z1)
    Z2Z2 = sqr(Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(mul(Y1, Z2), Z2Z2)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = sub(U2, U1)
    H2 = add(H, H)
    I = sqr(H2)
    J = mul(H, I)
    r = sub(S2, S1)
    r = add(r, r)
    V = mul(U1, I)
    r2 = sqr(r)
    X3 = sub(sub(r2, J), add(V, V))
    SJ = mul(S1, J)
    Y3 = sub(mul(r, sub(V, X3)), add(SJ, SJ))
    ZZ = sqr(add(Z1, Z2))
    Z3 = mul(sub(sub(ZZ, Z1Z1), Z2Z2), H)

    p_inf = limb.is_zero(Z1)
    q_inf = limb.is_zero(Z2)
    both = ~p_inf & ~q_inf
    x_eq = limb.eq(U1, U2) & both
    y_eq = limb.eq(S1, S2)
    is_dbl = x_eq & y_eq
    is_cancel = x_eq & ~y_eq

    D = dbl(P, spec)
    X3 = limb.select(is_dbl, D[0], X3)
    Y3 = limb.select(is_dbl, D[1], Y3)
    Z3 = limb.select(is_dbl, D[2], Z3)
    Z3 = limb.select(is_cancel, jnp.zeros_like(Z3), Z3)
    X3 = limb.select(p_inf, X2, limb.select(q_inf, X1, X3))
    Y3 = limb.select(p_inf, Y2, limb.select(q_inf, Y1, Y3))
    Z3 = limb.select(p_inf, Z2, limb.select(q_inf, Z1, Z3))
    return (X3, Y3, Z3)


def mixed_add_unsafe(P, Qa, spec: FieldSpec):
    """Jacobian + affine (7M + 4S): assumes Q finite and P != +-Q."""
    X1, Y1, Z1 = P
    X2, Y2 = Qa
    add, sub, mul, sqr = _ops(spec)
    Z1Z1 = sqr(Z1)
    U2 = mul(X2, Z1Z1)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = sub(U2, X1)
    HH = sqr(H)
    I = add(HH, HH)
    I = add(I, I)  # 4 HH
    J = mul(H, I)
    r = sub(S2, Y1)
    r = add(r, r)
    V = mul(X1, I)
    r2 = sqr(r)
    X3 = sub(sub(r2, J), add(V, V))
    YJ = mul(Y1, J)
    Y3 = sub(mul(r, sub(V, X3)), add(YJ, YJ))
    ZH = sqr(add(Z1, H))
    Z3 = sub(sub(ZH, Z1Z1), HH)
    p_inf = limb.is_zero(Z1)
    onem = _one_mont_like(Z1, spec)
    X3 = limb.select(p_inf, X2, X3)
    Y3 = limb.select(p_inf, Y2, Y3)
    Z3 = limb.select(p_inf, onem, Z3)
    return (X3, Y3, Z3)


def _one_mont_like(Z, spec: FieldSpec):
    return jnp.broadcast_to(limb.const(spec.one_mont_limbs, Z.ndim), Z.shape)


def from_affine(Qa, spec: FieldSpec):
    X, Y = Qa
    return (X, Y, _one_mont_like(X, spec))


def infinity(spec: FieldSpec, batch_shape=()):
    z = jnp.zeros((spec.nlimbs,) + tuple(batch_shape), jnp.uint32)
    return (z, z, z)


def neg(P, spec: FieldSpec):
    X, Y, Z = P
    return (X, limb.neg_mod(Y, spec), Z)


def to_affine(P, spec: FieldSpec, axis: int = -1):
    """Batch-normalize via one batched inversion (ref batch_normalize,
    ecc/groups/element.hpp).  Returns (x, y, inf_mask)."""
    X, Y, Z = P
    zinv = limb.batch_inv_mont(Z, spec, axis=axis)
    z2 = limb.mont_mul(zinv, zinv, spec)
    z3 = limb.mont_mul(z2, zinv, spec)
    return (
        limb.mont_mul(X, z2, spec),
        limb.mont_mul(Y, z3, spec),
        limb.is_zero(Z),
    )


def is_on_curve_affine(Qa, spec: FieldSpec, b_int: int):
    """y^2 == x^3 + b for Montgomery-form affine points."""
    X, Y = Qa
    from ..numeric.bigint import int_to_limbs

    bm = jnp.asarray(int_to_limbs((b_int * spec.R) % spec.modulus))
    bm = bm.reshape((spec.nlimbs,) + (1,) * (X.ndim - 1))
    add, sub, mul, sqr = _ops(spec)
    lhs = sqr(Y)
    rhs = limb.add_mod(mul(sqr(X), X), jnp.broadcast_to(bm, X.shape), spec)
    return limb.eq(lhs, rhs)


# -- Complete homogeneous-projective ops (Renes-Costello-Batina 2016) ------
#
# Branchless complete addition/doubling for a=0 short-Weierstrass curves on
# (X:Y:Z) homogeneous coordinates, identity = (0:1:0).  One uniform formula
# (12M + 2 constant muls) replaces the Jacobian add_complete's
# add_unsafe+dbl+eq-select composite (~2x the muls and ~2x the XLA graph),
# and is *sound for all inputs* — the MSM bucket phase needs no
# linear-independence argument for its plateau/coincidence cases.
# Role of the reference's element::operator+= completeness handling
# (ecc/groups/element_impl.hpp).


def _b3_mont(spec: FieldSpec, b_int: int, ndim: int):
    from ..numeric.bigint import int_to_limbs

    b3 = (3 * b_int * spec.R) % spec.modulus
    return limb.const(np.asarray(int_to_limbs(b3)), ndim)


def proj_add_complete(P, Q, spec: FieldSpec, b_int: int):
    """(X1:Y1:Z1) + (X2:Y2:Z2), complete (RCB16 algorithm 7, a=0)."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    add, sub, mul, sqr = _ops(spec)
    b3 = jnp.broadcast_to(_b3_mont(spec, b_int, X1.ndim), X1.shape)
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(Y1, Z1), add(Y2, Z2))
    t4 = sub(t4, add(t1, t2))
    X3 = mul(add(X1, Z1), add(X2, Z2))
    Y3 = sub(X3, add(t0, t2))
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = mul(b3, t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mul(b3, Y3)
    X3 = sub(mul(t3, t1), mul(t4, Y3))
    Y3 = add(mul(t1, Z3), mul(Y3, t0))
    Z3 = add(mul(Z3, t4), mul(t0, t3))
    return (X3, Y3, Z3)


def proj_dbl(P, spec: FieldSpec, b_int: int):
    """2*(X:Y:Z), complete (RCB16 algorithm 9, a=0)."""
    X, Y, Z = P
    add, sub, mul, sqr = _ops(spec)
    b3 = jnp.broadcast_to(_b3_mont(spec, b_int, X.ndim), X.shape)
    t0 = sqr(Y)
    Z3 = add(t0, t0)
    Z3 = add(Z3, Z3)
    Z3 = add(Z3, Z3)
    t1 = mul(Y, Z)
    t2 = mul(b3, sqr(Z))
    X3 = mul(t2, Z3)
    Y3 = add(t0, t2)
    Z3 = mul(t1, Z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)
    t0 = sub(t0, t2)
    Y3 = add(X3, mul(t0, Y3))
    X3 = mul(t0, mul(X, Y))
    X3 = add(X3, X3)
    return (X3, Y3, Z3)


def proj_infinity(spec: FieldSpec, batch_shape=()):
    """(0 : 1 : 0) in Montgomery form."""
    z = jnp.zeros((spec.nlimbs,) + tuple(batch_shape), jnp.uint32)
    one = jnp.broadcast_to(limb.const(spec.one_mont_limbs, z.ndim), z.shape)
    return (z, one, z)


def jacobian_to_proj(P, spec: FieldSpec):
    """(Xj:Yj:Zj) Jacobian -> (Xj*Zj : Yj : Zj^3); infinity -> (0:1:0)."""
    X, Y, Z = P
    add, sub, mul, sqr = _ops(spec)
    Xp = mul(X, Z)
    Zp = mul(sqr(Z), Z)
    inf = limb.is_zero(Z)
    one = _one_mont_like(Y, spec)
    return (Xp, limb.select(inf, one, Y), Zp)


def proj_to_jacobian(P, spec: FieldSpec):
    """(X:Y:Z) -> Jacobian (X*Z, Y*Z^2, Z); identity maps to Z=0."""
    X, Y, Z = P
    add, sub, mul, sqr = _ops(spec)
    return (mul(X, Z), mul(Y, sqr(Z)), Z)


def proj_mask_to_infinity(keep_mask, P, spec: FieldSpec):
    X, Y, Z = P
    one = _one_mont_like(Y, spec)
    return (
        jnp.where(keep_mask[None], X, jnp.zeros_like(X)),
        limb.select(keep_mask, Y, one),
        jnp.where(keep_mask[None], Z, jnp.zeros_like(Z)),
    )


def eq_jacobian(P, Q, spec: FieldSpec):
    """Projective equality with infinity handling."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    add, sub, mul, sqr = _ops(spec)
    Z1Z1 = sqr(Z1)
    Z2Z2 = sqr(Z2)
    x_eq = limb.eq(mul(X1, Z2Z2), mul(X2, Z1Z1))
    y_eq = limb.eq(mul(mul(Y1, Z2), Z2Z2), mul(mul(Y2, Z1), Z1Z1))
    p_inf = limb.is_zero(Z1)
    q_inf = limb.is_zero(Z2)
    return (p_inf & q_inf) | (~p_inf & ~q_inf & x_eq & y_eq)
