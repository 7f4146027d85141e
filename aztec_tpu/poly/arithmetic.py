"""Polynomial arithmetic device kernels beyond the FFT.

TPU-native re-design of the reference's polynomial_arithmetic.cpp helpers the
PLONK prover needs (ref: polynomials/polynomial_arithmetic.cpp:727 kate
opening quotient, :752 get_lagrange_evaluations, evaluate):

- ``poly_eval``: batched Horner is sequential; instead evaluate as one
  <coeffs, powers-of-z> inner product: an elementwise Montgomery multiply and
  a log-depth add_mod reduction tree.
- ``kate_divide``: the reference's serial recurrence
  ``dest[i] = (src[i] - dest[i-1]) * (-1/z)`` is a first-order linear
  recurrence; closed form dest[i] = -z^{-(i+1)} * sum_{j<=i} src[j] z^j, so it
  becomes: scale by powers of z, one inclusive prefix-sum scan (add_mod),
  scale by powers of z^{-1}, negate.  Log-depth instead of O(n) serial.

Host-side scalar helpers (lagrange evaluations at a challenge point) operate
on Python ints: they are O(1) per proof and belong on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ff import FR, limb
from ..ff import pallas_field as pf
from ..ff.bn254 import FR_MOD
from ..numeric.bigint import int_to_limbs
from .domain import powers_table


def _mul(a, b):
    """Montgomery multiply routed to the fused Pallas kernel on TPU —
    the jnp limb path materializes a (16, 16, batch) outer product that
    reaches GBs at the prover's (k, n) eval stacks (ultra OOM, r5)."""
    if pf.use_pallas():
        return pf.mont_mul(a, b, FR)
    return limb.mont_mul(a, b, FR)


def fr_mont_plane(v: int) -> jnp.ndarray:
    """Canonical int -> (L,) Montgomery limb plane (host boundary)."""
    return jnp.asarray(int_to_limbs((v % FR_MOD) * FR.R % FR_MOD))


@functools.partial(jax.jit, static_argnames=("n",))
def _tree_sum(y, n: int):
    """add_mod reduction over the last axis (power-of-two padded)."""
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = jnp.zeros(y.shape[:-1] + (m - n,), y.dtype)
        y = jnp.concatenate([y, pad], axis=-1)
    while m > 1:
        m //= 2
        y = limb.add_mod(y[..., :m], y[..., m : 2 * m], FR)
    return y[..., 0]


def poly_eval(coeffs, z_int: int):
    """Evaluate a Montgomery-form coefficient array (L, n) at canonical z.

    Returns the canonical int (host).  Builds the powers-of-z table on device
    (log n Montgomery muls over n lanes).
    """
    n = coeffs.shape[-1]
    zp = powers_table(fr_mont_plane(z_int), n, FR)
    y = _mul(coeffs, zp)
    out = _tree_sum(y, n)
    from ..numeric.bigint import limbs_to_int
    import numpy as np

    v = limbs_to_int(np.asarray(limb.from_mont(out[:, None], FR))[:, 0])
    return v


def poly_eval_many(stack, z_int: int):
    """Evaluate k polynomials at once. stack: (L, k, n) Montgomery planes.

    Returns list of k canonical ints.
    """
    n = stack.shape[-1]
    zp = powers_table(fr_mont_plane(z_int), n, FR)
    y = _mul(stack, zp[:, None, :])
    out = _tree_sum(y, n)  # (L, k)
    from ..numeric.bigint import limbs_to_ints
    import numpy as np

    return limbs_to_ints(np.asarray(limb.from_mont(out, FR)))


@functools.partial(jax.jit, static_argnames=("n",))
def _kate_divide_jit(src, zpow, zinv_pow, n: int):
    # dest[i] = -z^{-(i+1)} * prefix_{j<=i}(src[j] * z^j)
    scaled = _mul(src, zpow)
    prefix = lax.associative_scan(
        lambda a, b: limb.add_mod(a, b, FR), scaled, axis=1
    )
    out = _mul(prefix, zinv_pow)
    return limb.neg_mod(out, FR)


def kate_divide(src, z_int: int):
    """W(X) = (F(X) - F(z)) / (X - z) for exact division.

    ``src``: (L, n) Montgomery coefficients of F minus-its-evaluation is NOT
    required: exactness makes the recurrence identical to the reference's
    (polynomial_arithmetic.cpp:727-750) which subtracts F(z) from src[0];
    callers must pass src with src[0] already adjusted (src[0] -= F(z)).
    Returns (L, n) Montgomery coefficients of W (degree n-1).
    """
    n = src.shape[-1]
    z = z_int % FR_MOD
    zinv = pow(z, -1, FR_MOD)
    zp = powers_table(fr_mont_plane(z), n, FR)
    # z^{-(i+1)} = zinv * zinv^i
    zip_ = powers_table(fr_mont_plane(zinv), n, FR)
    zip_ = _mul(zip_, fr_mont_plane(zinv)[:, None])
    return _kate_divide_jit(src, zp, zip_, n)


# -- host-side scalar lagrange evaluations (ref polynomial_arithmetic.cpp:752)


def get_lagrange_evaluations(z: int, n: int, root: int, k_roots_cut: int = 4):
    """Returns (vanishing_poly Z*_H(z), l_start L_1(z), l_end L_{n-k}(z))
    as canonical ints; mirrors get_lagrange_evaluations."""
    z = z % FR_MOD
    z_pow_n = pow(z, n, FR_MOD)
    numerator = (z_pow_n - 1) % FR_MOD
    root_inv = pow(root, -1, FR_MOD)

    den0 = 1
    work_root = root_inv
    for _ in range(k_roots_cut):
        den0 = den0 * (z - work_root) % FR_MOD
        work_root = work_root * root_inv % FR_MOD

    den1 = (z - 1) % FR_MOD
    l_end_root = pow(root, k_roots_cut + 1, FR_MOD)
    den2 = (z * l_end_root - 1) % FR_MOD

    n_inv = pow(n, -1, FR_MOD)
    vanishing = numerator * pow(den0, -1, FR_MOD) % FR_MOD
    scaled_num = numerator * n_inv % FR_MOD
    l_start = scaled_num * pow(den1, -1, FR_MOD) % FR_MOD
    l_end = scaled_num * pow(den2, -1, FR_MOD) % FR_MOD
    return vanishing, l_start, l_end


def compute_public_input_delta(inputs, beta: int, gamma: int, root: int):
    """ref: plonk/proof_system/public_inputs/public_inputs_impl.hpp.

    Uses coset generators k_1 (=5) for the numerator and the external coset
    generator (=12) for the denominator.
    """
    from ..ff.bn254 import FR_COSET_GENERATORS

    k1 = FR_COSET_GENERATORS[0]
    k_ext = FR_COSET_GENERATORS[7]
    num = 1
    den = 1
    work_root = 1
    for w in inputs:
        t0 = (w + gamma) % FR_MOD
        t1 = work_root * beta % FR_MOD
        num = num * (t1 * k1 + t0) % FR_MOD
        den = den * (t1 * k_ext + t0) % FR_MOD
        work_root = work_root * root % FR_MOD
    return num * pow(den, -1, FR_MOD) % FR_MOD


@functools.partial(jax.jit, static_argnames=("n",))
def _barycentric_jit(evals, z_mont, winv_pows, num_mont, n: int):
    # denominators d_i = z * w^{-i} - 1, inverted in ONE batched inversion
    one = limb.one_mont(FR)[:, None]
    zw = limb.mont_mul(winv_pows, z_mont[:, None], FR)
    den = limb.sub_mod(zw, one, FR)
    den_inv = limb.batch_inv_mont(den, FR)
    terms = limb.mont_mul(evals, den_inv, FR)
    s = _tree_sum(terms, n)
    return limb.mont_mul(s[:, None], num_mont[:, None], FR)[:, 0]


def compute_barycentric_evaluation(evals, z_int: int, domain):
    """r = sum_i L_i(z) * f_i from EVALUATION form, without an iFFT.

    TPU-native form of the reference's compute_barycentric_evaluation
    (polynomial_arithmetic.cpp:814-846): L_i(z) = ((z^n - 1)/n) /
    (z*w^{-i} - 1), so the whole evaluation is one batched Montgomery
    multiply against inverted denominators (ONE inversion via the
    prefix-product trick) and a log-depth reduction tree — no serial
    denominator loop.

    evals: (L, m) Montgomery evaluation planes over the first m points of
    ``domain`` (m <= domain.size); z_int: canonical challenge.  Returns
    the canonical int r.
    """
    import numpy as np

    from ..numeric.bigint import limbs_to_int

    m = evals.shape[-1]
    n = domain.size
    z = z_int % FR_MOD
    numerator = (pow(z, n, FR_MOD) - 1) * pow(n, -1, FR_MOD) % FR_MOD
    root_inv = pow(domain.root, -1, FR_MOD)
    winv = powers_table(fr_mont_plane(root_inv), m, FR)
    out = _barycentric_jit(evals, fr_mont_plane(z), winv,
                           fr_mont_plane(numerator), m)
    return limbs_to_int(np.asarray(limb.from_mont(out[:, None], FR))[:, 0])
