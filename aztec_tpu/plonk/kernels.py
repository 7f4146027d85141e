"""Fused device kernels for the PLONK prover rounds.

TPU-native re-design of the reference's widget loops:

- ``grand_product``: the permutation widget's per-thread running products +
  batch inversion (ref: permutation_widget_impl.hpp:47-241) become two
  log-depth associative product scans (numerator prefix, denominator suffix)
  plus ONE Fermat inversion of the total — no serial accumulators.
- ``std_quotient``: one fused elementwise pass over the 4n coset evaluations
  computing the permutation quotient term (permutation_widget_impl.hpp:
  316-501), the arithmetic gate term (arithmetic_widget.hpp:8-68), and the
  division by the pseudo-vanishing polynomial Z*_H
  (polynomial_arithmetic.cpp:628-725, folded into one precomputed
  per-evaluation scale table) — what the reference does in three passes with
  OpenMP is one XLA fusion here.
- ``linear_combination``: generic sum_k scalar_k * poly_k used for the
  linearisation polynomial r(X) (prover.cpp:388) and Kate batch opening
  aggregation (kate_commitment_scheme.cpp:133-236).
- ``sigma_from_mapping``: permutation mapping -> sigma polynomial values
  omega^row * coset_factor (ref: proof_system/utils/permutation.hpp).

All polynomials are Montgomery-form uint32 limb planes (L, n); scalars enter
as (L, 1) Montgomery planes prepared on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ff import FR, limb
from ..ff import pallas_field as pf
from ..ff.bn254 import FR_MOD, FR_COSET_GENERATORS
from ..numeric.bigint import int_to_limbs
from ..poly.domain import powers_table


def _c(v: int, ndim: int = 2):
    """Static Montgomery constant plane for use inside jit."""
    return jnp.asarray(int_to_limbs(v * FR.R % FR_MOD)).reshape(
        (FR.nlimbs,) + (1,) * (ndim - 1)
    )


# On TPU these route to the fused Pallas field kernels: the jnp limb
# mont_mul materializes a (16, 16, batch) outer product per call — at the
# quotient's 4n = 2^19 width that is a 512 MB HLO temp PER MULTIPLY (the
# turbo quotient OOM'd HBM, r5) and ~268 ns/elem of HBM traffic.  The
# fused kernels keep each op at one (16, n) round trip.

def _mul(a, b):
    if pf.use_pallas():
        return pf.mont_mul(a, b, FR)
    return limb.mont_mul(a, b, FR)


def _add(a, b):
    if pf.use_pallas():
        return pf.add_mod(a, b, FR)
    return limb.add_mod(a, b, FR)


def _sub(a, b):
    if pf.use_pallas():
        return pf.sub_mod(a, b, FR)
    return limb.sub_mod(a, b, FR)


@functools.partial(jax.jit, static_argnames=("n",))
def grand_product(wires, sigmas, beta, gamma, omega_pows, randoms, n: int):
    """Permutation grand product Z(X) in lagrange form, blinded.

    wires/sigmas: (L, W, n) stacks (lagrange base), W = program width;
    beta/gamma: (L, 1); omega_pows: (L, n) powers of the n-th root;
    randoms: (L, 3) blinding.  Z[0]=1, Z[i]=prod_{j<i} num_j/den_j; blinding
    written to indices n-4+1 .. n-4+3
    (ref: permutation_widget_impl.hpp:47-314).
    """
    width = wires.shape[1]
    b_om = _mul(beta, omega_pows)

    num = None
    den = None
    for k in range(width):
        wg = _add(wires[:, k], gamma)
        id_term = b_om if k == 0 else _mul(_c(FR_COSET_GENERATORS[k - 1]), b_om)
        nk = _add(wg, id_term)
        dk = _add(wg, _mul(beta, sigmas[:, k]))
        num = nk if num is None else _mul(num, nk)
        den = dk if den is None else _mul(den, dk)

    prefix_num = lax.associative_scan(_mul, num, axis=1)
    suffix_den = lax.associative_scan(_mul, den, axis=1, reverse=True)
    total = suffix_den[:, :1]
    inv_total = limb.inv_mont(total, FR)

    one = jnp.broadcast_to(_c(1), (FR.nlimbs, 1))
    zrest = _mul(_mul(prefix_num[:, : n - 1], suffix_den[:, 1:]), inv_total)
    z = jnp.concatenate([one, zrest], axis=1)
    z = lax.dynamic_update_slice(z, randoms, (0, n - 4 + 1))
    return z


def _perm_quotient(wffts, sffts, zfft, l1fft, coset_pts, alpha, beta, gamma,
                   delta):
    """Permutation-argument quotient term over the 4n coset, any width
    (ref: permutation_widget_impl.hpp:316-501)."""
    width = wffts.shape[1]
    one = _c(1)
    b_pts = _mul(beta, coset_pts)
    zfw = jnp.roll(zfft, -4, axis=1)

    num = None
    den = None
    for k in range(width):
        wg = _add(wffts[:, k], gamma)
        id_term = b_pts if k == 0 else _mul(_c(FR_COSET_GENERATORS[k - 1]), b_pts)
        nk = _add(wg, id_term)
        dk = _add(wg, _mul(beta, sffts[:, k]))
        num = nk if num is None else _mul(num, nk)
        den = dk if den is None else _mul(den, dk)
    num = _mul(num, zfft)
    den = _mul(den, zfw)

    # (Z(Xw) - delta) * alpha * L_end;  L_end = L_1 shifted by (k+1) => roll 20
    t0a = _mul(
        _mul(_sub(zfw, jnp.broadcast_to(delta, zfw.shape)), alpha),
        jnp.roll(l1fft, -(4 + 4 * 4), axis=1),
    )
    # (Z(X) - 1) * alpha^2 * L_1
    alpha_sqr = _mul(alpha, alpha)
    t0b = _mul(_mul(_sub(zfft, jnp.broadcast_to(one, zfft.shape)), alpha_sqr), l1fft)

    return _mul(_sub(_add(_add(num, t0a), t0b), den), alpha)


@functools.partial(jax.jit, static_argnames=("n",))
def std_quotient(
    wffts,          # (L, 3, 4n) wire coset ffts
    sffts,          # (L, 3, 4n) sigma coset ffts
    zfft,           # (L, 4n)
    qffts,          # (L, 5, 4n) in order qm, q1, q2, q3, qc
    l1fft,          # (L, 4n) L_1 on the 4n coset
    coset_pts,      # (L, 4n) evaluation points g * W^i
    vanish_scale,   # (L, 4n) 1/Z*_H at each point (precomputed per key)
    alpha,          # (L, 1)
    beta,
    gamma,
    delta,          # public input delta
    n: int,
):
    """Fused standard-PLONK quotient evaluations over the 4n coset."""
    w1, w2, w3 = wffts[:, 0], wffts[:, 1], wffts[:, 2]
    perm = _perm_quotient(wffts, sffts, zfft, l1fft, coset_pts, alpha, beta,
                          gamma, delta)

    # arithmetic gate: (qm*w1*w2 + q1*w1 + q2*w2 + q3*w3 + qc) * alpha^4
    alpha_sqr = _mul(alpha, alpha)
    alpha_quad = _mul(alpha_sqr, alpha_sqr)
    arith = _mul(qffts[:, 0], _mul(w1, w2))
    arith = _add(arith, _mul(qffts[:, 1], w1))
    arith = _add(arith, _mul(qffts[:, 2], w2))
    arith = _add(arith, _mul(qffts[:, 3], w3))
    arith = _add(arith, qffts[:, 4])
    arith = _mul(arith, alpha_quad)

    return _mul(_add(perm, arith), vanish_scale)


def _quad_range_term(delta):
    """D(D-1)(D-2)(D-3) (ref: turbo_range_widget.hpp)."""
    t0 = _sub(_mul(delta, delta), delta)
    t1 = _sub(delta, _c(2))
    t2 = _sub(delta, _c(3))
    return _mul(_mul(t0, t1), t2)


def _dbl2(x):
    return _add(x, x)


def _x4(x):
    return _dbl2(_dbl2(x))


def _turbo_terms(
    wffts,          # (L, 4, 4n)
    sffts,          # (L, 4, 4n)
    zfft,           # (L, 4n)
    qffts,          # (L, 11, 4n): qm q1 q2 q3 q4 q5 qc qarith qecc qrange qlogic
    l1fft,
    coset_pts,
    vanish_scale,
    alphas,         # (L, >=21): powers alpha^1..
    beta,
    gamma,
    delta,
    n: int,
):
    """Fused TurboPlonk quotient over the 4n coset: permutation +
    turbo-arithmetic + fixed-base ECC + range + logic kernels in one pass
    (ref: turbo_arithmetic_widget.hpp, turbo_fixed_base_widget.hpp:8-176,
    turbo_range_widget.hpp, turbo_logic_widget.hpp; alpha schedule per
    transition_widget.hpp:43-90 — perm ends at alpha^4, arithmetic spans
    alpha^4..5, fixed-base alpha^6..12, range alpha^13..16,
    logic alpha^17..20)."""
    a = lambda p: alphas[:, p - 1 : p]  # alpha^p as (L, 1)

    w1, w2, w3, w4 = (wffts[:, i] for i in range(4))
    w1w = jnp.roll(w1, -4, axis=1)
    w2w = jnp.roll(w2, -4, axis=1)
    w3w = jnp.roll(w3, -4, axis=1)
    w4w = jnp.roll(w4, -4, axis=1)
    qm, q1, q2, q3, q4, q5, qc, qarith, qecc, qrange, qlogic = (
        qffts[:, i] for i in range(11)
    )
    one = jnp.broadcast_to(_c(1), w1.shape)

    perm = _perm_quotient(wffts, sffts, zfft, l1fft, coset_pts, a(1), beta,
                          gamma, delta)

    # ---- turbo arithmetic (alpha^4, alpha^5) --------------------------------
    arith = _mul(qm, _mul(_mul(w1, w2), qarith))
    arith = _add(arith, _mul(q1, _mul(w1, qarith)))
    arith = _add(arith, _mul(q2, _mul(w2, qarith)))
    arith = _add(arith, _mul(q3, _mul(w3, qarith)))
    arith = _add(arith, _mul(q4, _mul(w4, qarith)))
    # q5 multiplicand: (w4^2 - w4)(w4 - 2) * q_arith * alpha
    t5 = _mul(_sub(_mul(w4, w4), w4), _sub(w4, _c(2)))
    arith = _add(arith, _mul(q5, _mul(_mul(t5, qarith), a(1))))
    arith = _add(arith, _mul(qc, qarith))
    arith = _mul(arith, a(4))

    # non-linear quad-extraction term, active when q_arith == 2
    dlt = _sub(w3, _x4(w4))
    t = _mul(dlt, _sub(_sub(_mul(_c(9), dlt), _dbl2(_mul(dlt, dlt))), _c(7)))
    arith = _add(
        arith,
        _mul(_mul(_sub(_mul(qarith, qarith), qarith), t), a(4)),
    )

    # ---- fixed-base ECC (alpha^6..alpha^12) ---------------------------------
    delta_e = _sub(w4w, _x4(w4))
    delta_sq = _mul(delta_e, delta_e)

    fb = _mul(q1, _mul(_mul(delta_sq, qecc), a(7)))
    fb = _add(fb, _mul(q2, _mul(qecc, a(7))))
    q3m = _mul(
        _mul(_mul(_sub(w1w, w1), delta_e), _mul(w3w, a(9))), qecc
    )
    t1 = _mul(_mul(delta_e, w3w), _mul(w2, a(8)))
    q3m = _add(q3m, _mul(_dbl2(t1), qecc))
    fb = _add(fb, _mul(q3, q3m))
    fb = _add(fb, _mul(q4, _mul(_mul(w3, qecc), _mul(qc, a(11)))))
    fb = _add(fb, _mul(q5, _mul(_mul(_sub(one, w4), qecc), _mul(qc, a(11)))))
    fb = _add(fb, _mul(qm, _mul(_mul(w3, qecc), _mul(qc, a(12)))))

    # non-linear terms
    acc_id = _mul(
        _mul(
            _mul(_add(delta_e, one), _add(delta_e, _c(3))),
            _mul(_sub(delta_e, one), _sub(delta_e, _c(3))),
        ),
        a(6),
    )
    x_alpha_id = limb.neg_mod(_mul(w3w, a(7)), FR)
    t0 = _mul(_add(_add(w1w, w1), w3w), _mul(_sub(w3w, w1), _sub(w3w, w1)))
    t1 = limb.neg_mod(
        _add(_add(_mul(_mul(w3w, w3w), w3w), _mul(w2, w2)),
             jnp.broadcast_to(_c((-17) % FR_MOD), w1.shape)),
        FR,
    )
    t2 = _dbl2(_mul(_mul(delta_e, w2), qecc))
    x_acc_id = _mul(_add(_add(t0, t1), t2), a(8))
    t0 = _mul(_add(w2w, w2), _sub(w3w, w1))
    t1 = _mul(_sub(w1, w1w), _sub(w2, _mul(qecc, delta_e)))
    y_acc_id = _mul(_add(t0, t1), a(9))
    t0 = _sub(w4, one)
    t1 = _sub(t0, w3)
    acc_init_id = _mul(_mul(t0, t1), a(10))
    x_init_id = limb.neg_mod(_mul(_mul(w1, w3), a(11)), FR)
    y_init_id = _mul(_sub(_mul(_sub(one, w4), qc), _mul(w2, w3)), a(12))
    gate_id = _mul(_add(_add(acc_init_id, x_init_id), y_init_id), qc)
    gate_id = _add(
        _add(gate_id, acc_id), _add(x_alpha_id, _add(x_acc_id, y_acc_id))
    )
    fb = _add(fb, _mul(gate_id, qecc))

    # ---- range (alpha^13..alpha^16) -----------------------------------------
    d1 = _sub(w3, _x4(w4))
    d2 = _sub(w2, _x4(w3))
    d3 = _sub(w1, _x4(w2))
    d4 = _sub(w4w, _x4(w1))
    rng = _mul(_quad_range_term(d1), a(13))
    rng = _add(rng, _mul(_quad_range_term(d2), a(14)))
    rng = _add(rng, _mul(_quad_range_term(d3), a(15)))
    rng = _add(rng, _mul(_quad_range_term(d4), a(16)))
    rng = _mul(rng, qrange)

    # ---- logic (alpha^17..alpha^20) -----------------------------------------
    alpha1 = a(1)
    qa = _sub(w1w, _x4(w1))
    qb = _sub(w2w, _x4(w2))
    delta_sum = _add(qa, qb)
    qa2 = _mul(qa, qa)
    qb2 = _mul(qb, qb)
    delta_sq_sum = _add(qa2, qb2)
    identity = _sub(_mul(delta_sum, delta_sum), delta_sq_sum)  # 2ab
    identity = _sub(identity, _dbl2(w3))                        # 2(ab - w)
    identity = _mul(identity, alpha1)
    # + a(a-1)(a-2)(a-3), then * alpha
    t2a = _sub(qa2, qa)
    t0 = _add(_sub(t2a, _x4(qa)), jnp.broadcast_to(_c(6), qa.shape))
    identity = _mul(_add(identity, _mul(t0, t2a)), alpha1)
    t3b = _sub(qb2, qb)
    t1 = _add(_sub(t3b, _x4(qb)), jnp.broadcast_to(_c(6), qb.shape))
    identity = _mul(_add(identity, _mul(t1, t3b)), alpha1)

    three_ab = _add(_dbl2(delta_sum), delta_sum)          # 3(a+b)
    nine_ab = _add(_dbl2(three_ab), three_ab)             # 9(a+b)
    eighteen_ab = _dbl2(nine_ab)                          # 18(a+b)
    eightyone_ab = _add(nine_ab, _x4(eighteen_ab))        # 81(a+b)
    eighteen_sq = _mul(_c(18), delta_sq_sum)              # 18(a^2+b^2)

    w_term = _add(_sub(_x4(w3), eighteen_ab),
                  jnp.broadcast_to(_c(81), w3.shape))
    w_term = _mul(w_term, w3)
    t1 = _add(_sub(eighteen_sq, eightyone_ab),
              jnp.broadcast_to(_c(83), w3.shape))
    w_term = _mul(_add(w_term, t1), w3)  # delta_sum in the reference

    qc_term = _sub(w4w, _x4(w4))
    three_c = _add(_dbl2(qc_term), qc_term)
    nine_c = _add(_dbl2(three_c), three_c)
    t3 = _mul(_sub(nine_c, three_ab), qc)
    t2 = _sub(_add(three_c, three_ab), _dbl2(w_term))
    t2 = _add(t2, t3)
    identity = _mul(_add(identity, t2), a(17))
    logic = _mul(identity, qlogic)

    total = _add(_add(perm, arith), _add(fb, _add(rng, logic)))
    return _mul(total, vanish_scale)


@functools.partial(jax.jit, static_argnames=("n",))
def turbo_quotient(wffts, sffts, zfft, qffts, l1fft, coset_pts, vanish_scale,
                   alphas, beta, gamma, delta, n: int):
    return _turbo_terms(wffts, sffts, zfft, qffts, l1fft, coset_pts,
                        vanish_scale, alphas, beta, gamma, delta, n)


def _compress4(a, b, c, d, eta):
    """a + eta b + eta^2 c + eta^3 d via Horner (Montgomery planes)."""
    return _add(a, _mul(eta, _add(b, _mul(eta, _add(c, _mul(eta, d))))))


@functools.partial(jax.jit, static_argnames=("n",))
def lookup_grand_product(wires, q_lookup, q_index, tables, h1, h2, eta, beta,
                         gamma, randoms, n: int):
    """Plookup grand product Z_LOOKUP(X) in lagrange form, blinded.

    Per enforced row i (docs/ULTRA_DESIGN.md; plookup paper eq. 5 with the
    sorted list stored as even/odd halves h1/h2 so both pair products are
    row-local):

      z_{i+1}/z_i = (1+b)(g + F_i)(g(1+b) + T_i + b T_{i+1})
                    / [(g(1+b) + h1_i + b h2_i)(g(1+b) + h2_i + b h1_{i+1})]

    F = q_lookup * (w1 + eta w2 + eta^2 w3 + eta^3 q_index);
    T = t1 + eta t2 + eta^2 t3 + eta^3 t4.  Same scan + single-inversion
    structure as the permutation grand_product.

    wires: (L, >=3, n) lagrange stack; tables: (L, 4, n); h1/h2: (L, n);
    eta/beta/gamma: (L, 1); randoms: (L, 3).
    """
    one = _c(1)
    F = _mul(q_lookup,
             _compress4(wires[:, 0], wires[:, 1], wires[:, 2], q_index, eta))
    T = _compress4(tables[:, 0], tables[:, 1], tables[:, 2], tables[:, 3], eta)
    Tw = jnp.roll(T, -1, axis=1)
    h1w = jnp.roll(h1, -1, axis=1)

    one_p_beta = _add(beta, one)
    gamma_pb = _mul(gamma, one_p_beta)
    num = _mul(
        _mul(jnp.broadcast_to(one_p_beta, F.shape), _add(gamma, F)),
        _add(_add(T, _mul(beta, Tw)), gamma_pb),
    )
    den = _mul(
        _add(_add(h1, _mul(beta, h2)), gamma_pb),
        _add(_add(h2, _mul(beta, h1w)), gamma_pb),
    )

    prefix_num = lax.associative_scan(_mul, num, axis=1)
    suffix_den = lax.associative_scan(_mul, den, axis=1, reverse=True)
    inv_total = limb.inv_mont(suffix_den[:, :1], FR)

    one_col = jnp.broadcast_to(_c(1), (FR.nlimbs, 1))
    zrest = _mul(_mul(prefix_num[:, : n - 1], suffix_den[:, 1:]), inv_total)
    z = jnp.concatenate([one_col, zrest], axis=1)
    z = lax.dynamic_update_slice(z, randoms, (0, n - 4 + 1))
    return z


def _lookup_quotient(wffts, qlfft, qifft, tffts, s1fft, s2fft, zlfft, l1fft,
                     eta, beta, gamma, a):
    """Plookup quotient terms over the 4n coset (alpha^21..23).

    (num - den) ranges over the identity rows (killed by Z*_H elsewhere);
    L_1 (z_lookup - 1) and L_end (z_lookup(Xw) - 1) pin the boundaries.
    One row shift in the n-domain = roll by 4 on the 4n coset grid.
    """
    one = _c(1)
    F = _mul(qlfft, _compress4(wffts[:, 0], wffts[:, 1], wffts[:, 2],
                               qifft, eta))
    T = _compress4(tffts[:, 0], tffts[:, 1], tffts[:, 2], tffts[:, 3], eta)
    Tw = jnp.roll(T, -4, axis=1)
    s1w = jnp.roll(s1fft, -4, axis=1)
    zlw = jnp.roll(zlfft, -4, axis=1)

    one_p_beta = _add(beta, one)
    gamma_pb = _mul(gamma, one_p_beta)
    num = _mul(
        _mul(jnp.broadcast_to(one_p_beta, F.shape), _add(gamma, F)),
        _add(_add(T, _mul(beta, Tw)), gamma_pb),
    )
    num = _mul(num, zlfft)
    den = _mul(
        _add(_add(s1fft, _mul(beta, s2fft)), gamma_pb),
        _add(_add(s2fft, _mul(beta, s1w)), gamma_pb),
    )
    den = _mul(den, zlw)

    onep = jnp.broadcast_to(one, zlfft.shape)
    t = _mul(_sub(num, den), a(21))
    t = _add(t, _mul(_mul(_sub(zlfft, onep), l1fft), a(22)))
    l_end = jnp.roll(l1fft, -(4 + 4 * 4), axis=1)
    t = _add(t, _mul(_mul(_sub(zlw, onep), l_end), a(23)))
    return t


@functools.partial(jax.jit, static_argnames=("n",))
def ultra_quotient(
    wffts,          # (L, 4, 4n)
    sffts,          # (L, 4, 4n)
    zfft,           # (L, 4n)
    qffts,          # (L, 11, 4n): turbo selector order
    tffts,          # (L, 4, 4n) table column coset ffts
    qlfft,          # (L, 4n) q_lookup
    qifft,          # (L, 4n) q_index
    s1fft,          # (L, 4n)
    s2fft,          # (L, 4n)
    zlfft,          # (L, 4n) z_lookup
    l1fft,
    coset_pts,
    vanish_scale,
    alphas,         # (L, 24): powers alpha^1..alpha^24
    eta,
    beta,
    gamma,
    delta,
    n: int,
):
    """Fused UltraPlonk quotient: all turbo widget terms + the plookup
    argument in one elementwise pass over the 4n coset."""
    turbo = _turbo_terms(
        wffts, sffts, zfft, qffts, l1fft, coset_pts,
        jnp.broadcast_to(_c(1), vanish_scale.shape),  # defer the divide
        alphas, beta, gamma, delta, n,
    )
    a = lambda p: alphas[:, p - 1 : p]
    lk = _lookup_quotient(wffts, qlfft, qifft, tffts, s1fft, s2fft, zlfft,
                          l1fft, eta, beta, gamma, a)
    return _mul(_add(turbo, lk), vanish_scale)


@jax.jit
def linear_combination(stack, scalars):
    """sum_k scalars[:,k] * stack[:,k,:] -> (L, n).

    stack: (L, k, n); scalars: (L, k).  Montgomery in/out.  k is a static
    shape (small: ~10 polys), so the reduction unrolls into one XLA fusion.
    """
    y = limb.mont_mul(stack, scalars[:, :, None], FR)
    acc = y[:, 0]
    for i in range(1, y.shape[1]):
        acc = limb.add_mod(acc, y[:, i], FR)
    return acc


@functools.partial(jax.jit, static_argnames=("n",))
def sigma_from_mapping(next_row, factor_idx, omega_pows, n: int):
    """sigma lagrange values: omega^{next_row} * factor[factor_idx].

    next_row, factor_idx: (n,) int32; factors are the static coset encoding
    constants [1, k1, k2, k3, k_external] (ref: utils/permutation.hpp —
    column 0 -> 1, column j>0 -> coset_generator(j-1), public input ->
    external_coset_generator = coset_generators[7]).  Index 4 is the
    external tag: width-4 column 3 MUST get coset_generator(2), not the
    external generator (a width-3-only table hid that collision in r1).
    """
    factors = jnp.concatenate(
        [
            _c(1),
            _c(FR_COSET_GENERATORS[0]),
            _c(FR_COSET_GENERATORS[1]),
            _c(FR_COSET_GENERATORS[2]),
            _c(FR_COSET_GENERATORS[7]),
        ],
        axis=1,
    )  # (L, 5)
    root = jnp.take(omega_pows, next_row, axis=1)
    f = jnp.take(factors, factor_idx, axis=1)
    return _mul(root, f)


def vanishing_scale_table(small_n: int, large_root: int, small_root: int,
                          generator: int, k_cut: int = 4):
    """Returns (coset_pts, scale): the 4n coset evaluation points g*W^i and
    the per-point factor 1/Z*_H(g W^i) for the quotient division.

    Z*_H(x) = (x^n - 1) / prod_{j=1..k} (x - w^{n-j})
    (ref: polynomial_arithmetic.cpp:628-725).  Built once per proving key.
    """
    large_n = 4 * small_n
    W = powers_table(
        jnp.asarray(int_to_limbs(large_root * FR.R % FR_MOD)), large_n, FR
    )
    pts = _mul(_c(generator), W)  # g * W^i

    # denominator (x^n - 1)
    xn = limb.mont_pow(
        pts,
        np.array([(small_n >> i) & 1 for i in range(small_n.bit_length())], np.uint32),
        FR,
    )
    den = _sub(xn, jnp.broadcast_to(_c(1), xn.shape))

    # numerator: prod_j (x - w^{n-j}), j = 1..k
    num = jnp.broadcast_to(_c(1), pts.shape)
    root_inv = pow(small_root, -1, FR_MOD)
    w_pow = root_inv
    for _ in range(k_cut):
        num = _mul(num, _sub(pts, jnp.broadcast_to(_c(w_pow), pts.shape)))
        w_pow = w_pow * root_inv % FR_MOD

    inv_den = limb.batch_inv_mont(den, FR, axis=1)
    return pts, _mul(num, inv_den)


@functools.partial(jax.jit, static_argnames=("n",))
def mimc_quotient(
    wffts,          # (L, 3, 4n)
    sffts,          # (L, 3, 4n)
    zfft,           # (L, 4n)
    qffts,          # (L, 7, 4n): qm q1 q2 q3 qc q_mimc_coeff q_mimc_sel
    l1fft,
    coset_pts,
    vanish_scale,
    alpha,          # (L, 1)
    beta,
    gamma,
    delta,
    n: int,
):
    """Fused MiMC-composer quotient: standard PLONK + the x^7 block-cipher
    gate (ref: mimc_widget.hpp:8-60 — T0 = w1 + w3 + q_mimc_coeff,
    T1 = T0^3 - w2, T2 = w2^2*T0 - w3_omega, contribution
    (T1*alpha^5 + T2*alpha^6)*q_mimc_selector; alpha schedule follows the
    arithmetic widget at alpha^4)."""
    w1, w2, w3 = wffts[:, 0], wffts[:, 1], wffts[:, 2]
    perm = _perm_quotient(wffts, sffts, zfft, l1fft, coset_pts, alpha, beta,
                          gamma, delta)

    alpha_sqr = _mul(alpha, alpha)
    alpha_quad = _mul(alpha_sqr, alpha_sqr)
    arith = _mul(qffts[:, 0], _mul(w1, w2))
    arith = _add(arith, _mul(qffts[:, 1], w1))
    arith = _add(arith, _mul(qffts[:, 2], w2))
    arith = _add(arith, _mul(qffts[:, 3], w3))
    arith = _add(arith, qffts[:, 4])
    arith = _mul(arith, alpha_quad)

    a5 = _mul(alpha_quad, alpha)
    a6 = _mul(a5, alpha)
    w3w = jnp.roll(w3, -4, axis=1)
    T0 = _add(_add(w1, w3), qffts[:, 5])
    T1 = _sub(_mul(_mul(T0, T0), T0), w2)
    T2 = _sub(_mul(_mul(w2, w2), T0), w3w)
    mimc = _mul(_add(_mul(T1, a5), _mul(T2, a6)), qffts[:, 6])

    return _mul(_add(_add(perm, arith), mimc), vanish_scale)


@jax.jit
def elliptic_identity(wffts, q_beta, q_beta_sqr, q_sign, q_elliptic,
                      alpha, alpha2):
    """EllipticKernel identities (ref: elliptic_widget.hpp:8-80 — the ecc
    add gate family; defined here for parity even though, as in the
    reference snapshot, no composer instantiates it).

    wffts: (L, 4, rows) wires in gate layout; shifted access = roll -1 on
    the row axis ((x_1,y_1) at row i in w_2/w_3, (x_2,y_2) at row i+1 in
    w_1/w_4, (x_3,y_3) at row i+1 in w_2/w_3).  Returns the combined
    x/y-identity evaluation rows (zero on satisfied gates)."""
    w1, w2, w3, w4 = (wffts[:, i] for i in range(4))
    x_1, y_1 = w2, w3
    x_2 = jnp.roll(w1, -1, axis=-1)
    y_2 = jnp.roll(w4, -1, axis=-1)
    x_3 = jnp.roll(w2, -1, axis=-1)
    y_3 = jnp.roll(w3, -1, axis=-1)

    zero = jnp.zeros_like(x_2)
    beta_term = _mul(_sub(zero, _mul(x_2, x_1)),
                     _add(_add(x_3, x_3), x_1))
    x2_sqr = _mul(x_2, x_2)
    beta_sqr_term = _mul(x2_sqr, _sub(x_3, x_1))
    sign_term = _mul(y_2, y_1)
    sign_term = _add(sign_term, sign_term)
    leftovers = _mul(x2_sqr, x_2)
    leftovers = _add(leftovers, _mul(_mul(x_1, x_1), _add(x_3, x_1)))
    leftovers = _sub(leftovers, _add(_mul(y_2, y_2), _mul(y_1, y_1)))
    x_identity = _add(
        _add(_mul(beta_term, q_beta), _mul(beta_sqr_term, q_beta_sqr)),
        _add(_mul(sign_term, q_sign), leftovers))
    x_identity = _mul(x_identity, alpha)

    beta_term = _mul(_mul(x_2, _add(y_3, y_1)), q_beta)
    sign_term = _sub(zero, _mul(_mul(y_2, _sub(x_1, x_3)), q_sign))
    leftovers = _sub(_mul(y_1, _sub(x_1, x_3)),
                     _mul(x_1, _add(y_3, y_1)))
    y_identity = _mul(_add(_add(beta_term, sign_term), leftovers), alpha2)

    return _mul(_add(x_identity, y_identity), q_elliptic)
