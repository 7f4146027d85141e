"""Fused Pallas TPU kernels for whole elliptic-curve group operations.

Each kernel runs an ENTIRE group formula (7-12 Montgomery muls plus the
adds/subs and infinity selects) over a (16, 8, 128) tile per grid step,
with every intermediate field element living in VMEM/registers.  The jnp
path (curves/group.py) round-trips each of those intermediates through HBM
— measured at 17 ms for one width-32768 mixed add on v5e; the fused kernel
brings that to the compute bound (~0.2 ms).

Formulas are line-for-line mirrors of curves/group.py (Jacobian mixed/full
adds, RCB16 complete projective add/double), so outputs are bit-identical
— both paths produce canonical (< p) limbs.  See that module for the
reference citations (ecc/groups/element_impl.hpp etc.).

Dispatch: JacobianOps (curves/group_ops.py) routes through these kernels on
TPU for batches >= MIN_BATCH and falls back to the jnp path elsewhere
(CPU tests, tiny widths) — same results either way.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..ff import pallas_field as pf
from ..ff.pallas_field import KF, elementwise_op
from ..ff.spec import FieldSpec
from ..numeric.bigint import int_to_limbs

# One fused kernel call is ~20-50 us at ANY width (narrow batches pad to one
# 1024-element block), while the XLA limb path costs ~1 ms even at width 1
# (each of its ~30 tiny HLO ops pays device launch latency).  So pallas wins
# at every width on TPU; the gate exists only for explicit opt-out.
MIN_BATCH = 1


# ---- formulas (KF element lists in, element lists out) -------------------


def _f_mixed_add_unsafe(kf: KF, elems):
    """group.mixed_add_unsafe: Jacobian + affine, 7M + 4S."""
    X1, Y1, Z1, X2, Y2 = elems
    add, sub, mul, sqr = kf.add, kf.sub, kf.mul, kf.sqr
    Z1Z1 = sqr(Z1)
    U2 = mul(X2, Z1Z1)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = sub(U2, X1)
    HH = sqr(H)
    I = add(HH, HH)
    I = add(I, I)
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
    p_inf = kf.is_zero(Z1)
    onem = kf.one_mont_elem(Z1)
    X3 = kf.select(p_inf, X2, X3)
    Y3 = kf.select(p_inf, Y2, Y3)
    Z3 = kf.select(p_inf, onem, Z3)
    return [X3, Y3, Z3]


def _f_add_unsafe(kf: KF, elems):
    """group.add_unsafe: Jacobian + Jacobian, 11M + 5S."""
    X1, Y1, Z1, X2, Y2, Z2 = elems
    add, sub, mul, sqr = kf.add, kf.sub, kf.mul, kf.sqr
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
    p_inf = kf.is_zero(Z1)
    q_inf = kf.is_zero(Z2)
    X3 = kf.select(p_inf, X2, kf.select(q_inf, X1, X3))
    Y3 = kf.select(p_inf, Y2, kf.select(q_inf, Y1, Y3))
    Z3 = kf.select(p_inf, Z2, kf.select(q_inf, Z1, Z3))
    return [X3, Y3, Z3]


@functools.lru_cache(maxsize=None)
def _b3_limbs(spec: FieldSpec, b_int: int):
    b3 = (3 * b_int * spec.R) % spec.modulus
    return tuple(int(x) for x in int_to_limbs(b3))


def _make_proj_add(b3_limbs):
    def _f_proj_add(kf: KF, elems):
        """group.proj_add_complete: RCB16 algorithm 7 (a=0)."""
        X1, Y1, Z1, X2, Y2, Z2 = elems
        add, sub, mul = kf.add, kf.sub, kf.mul
        mul_b3 = lambda v: kf.mul_small(v, b3_limbs)
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
        t2 = mul_b3(t2)
        Z3 = add(t1, t2)
        t1 = sub(t1, t2)
        Y3 = mul_b3(Y3)
        X3 = sub(mul(t3, t1), mul(t4, Y3))
        Y3 = add(mul(t1, Z3), mul(Y3, t0))
        Z3 = add(mul(Z3, t4), mul(t0, t3))
        return [X3, Y3, Z3]

    return _f_proj_add


def _make_proj_dbl_n(b3_limbs, steps: int):
    """`steps` successive RCB16 doublings fused in one kernel: the MSM's
    per-round accumulator shift (c doublings, width 1) costs `steps`
    sequential device launches on the jnp path (~0.9 ms each, latency-
    bound); fused it is one launch.

    The steps run as an in-kernel lax.fori_loop so the doubling body is
    traced ONCE regardless of `steps` (an unrolled 16-step chain costs
    ~100 s of Python tracing per fresh process on this host — trace time
    is not covered by the persistent compile cache)."""
    import jax

    one = _make_proj_dbl(b3_limbs)

    def _f(kf: KF, elems):
        def body(_, e):
            return tuple(one(kf, list(e)))

        return list(jax.lax.fori_loop(0, steps, body, tuple(elems)))

    return _f


def _make_proj_dbl(b3_limbs):
    def _f_proj_dbl(kf: KF, elems):
        """group.proj_dbl: RCB16 algorithm 9 (a=0)."""
        X, Y, Z = elems
        add, sub, mul, sqr = kf.add, kf.sub, kf.mul, kf.sqr
        mul_b3 = lambda v: kf.mul_small(v, b3_limbs)
        t0 = sqr(Y)
        Z3 = add(t0, t0)
        Z3 = add(Z3, Z3)
        Z3 = add(Z3, Z3)
        t1 = mul(Y, Z)
        t2 = mul_b3(sqr(Z))
        X3 = mul(t2, Z3)
        Y3 = add(t0, t2)
        Z3 = mul(t1, Z3)
        t1 = add(t2, t2)
        t2 = add(t1, t2)
        t0 = sub(t0, t2)
        Y3 = add(X3, mul(t0, Y3))
        X3 = mul(t0, mul(X, Y))
        X3 = add(X3, X3)
        return [X3, Y3, Z3]

    return _f_proj_dbl


def _f_j2c(kf: KF, elems):
    """group.jacobian_to_proj: (Xj:Yj:Zj) -> (Xj*Zj : Yj : Zj^3)."""
    X, Y, Z = elems
    Xp = kf.mul(X, Z)
    Zp = kf.mul(kf.sqr(Z), Z)
    inf = kf.is_zero(Z)
    Yp = kf.select(inf, kf.one_mont_elem(Y), Y)
    return [Xp, Yp, Zp]


def _f_c2j(kf: KF, elems):
    """group.proj_to_jacobian: (X:Y:Z) -> (X*Z, Y*Z^2, Z)."""
    X, Y, Z = elems
    return [kf.mul(X, Z), kf.mul(Y, kf.sqr(Z)), Z]


# ---- public batch ops ----------------------------------------------------


@functools.lru_cache(maxsize=None)
def _mixed_add_op(spec: FieldSpec):
    return elementwise_op(spec, 5, 3, _f_mixed_add_unsafe, "mixed_add")


@functools.lru_cache(maxsize=None)
def _add_unsafe_op(spec: FieldSpec):
    return elementwise_op(spec, 6, 3, _f_add_unsafe, "add_unsafe")


@functools.lru_cache(maxsize=None)
def _proj_add_op(spec: FieldSpec, b_int: int):
    return elementwise_op(
        spec, 6, 3, _make_proj_add(_b3_limbs(spec, b_int)), f"proj_add_{b_int}"
    )


@functools.lru_cache(maxsize=None)
def _proj_dbl_op(spec: FieldSpec, b_int: int):
    return elementwise_op(
        spec, 3, 3, _make_proj_dbl(_b3_limbs(spec, b_int)), f"proj_dbl_{b_int}"
    )


@functools.lru_cache(maxsize=None)
def _proj_dbl_n_op(spec: FieldSpec, b_int: int, steps: int):
    return elementwise_op(
        spec, 3, 3, _make_proj_dbl_n(_b3_limbs(spec, b_int), steps),
        f"proj_dbl{steps}_{b_int}",
    )


@functools.lru_cache(maxsize=None)
def _j2c_op(spec: FieldSpec):
    return elementwise_op(spec, 3, 3, _f_j2c, "j2c")


@functools.lru_cache(maxsize=None)
def _c2j_op(spec: FieldSpec):
    return elementwise_op(spec, 3, 3, _f_c2j, "c2j")


def jacobian_to_proj(P, spec: FieldSpec):
    return tuple(_j2c_op(spec)(*P))


def proj_to_jacobian(P, spec: FieldSpec):
    return tuple(_c2j_op(spec)(*P))


def mixed_add_unsafe(P, Qa, spec: FieldSpec):
    return tuple(_mixed_add_op(spec)(*P, *Qa))


def add_unsafe(P, Q, spec: FieldSpec):
    return tuple(_add_unsafe_op(spec)(*P, *Q))


def proj_add_complete(P, Q, spec: FieldSpec, b_int: int):
    return tuple(_proj_add_op(spec, b_int)(*P, *Q))


def proj_dbl(P, spec: FieldSpec, b_int: int):
    return tuple(_proj_dbl_op(spec, b_int)(*P))


def proj_dbl_n(P, spec: FieldSpec, b_int: int, steps: int):
    """steps successive complete doublings, one fused kernel launch."""
    return tuple(_proj_dbl_n_op(spec, b_int, steps)(*P))


def batch_elems(P) -> int:
    """Total batch size of a point tuple's coordinate planes."""
    shape = P[0].shape[1:]
    return int(np.prod(shape)) if shape else 1


def enabled(P=None) -> bool:
    n = batch_elems(P) if P is not None else None
    if n is not None and n < MIN_BATCH:
        return False
    return pf.use_pallas(n)
