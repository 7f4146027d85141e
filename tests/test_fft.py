"""FFT tests: roundtrips and naive-DFT cross-checks.

Mirrors the reference's polynomial tests
(polynomials/polynomial_arithmetic.test.cpp: fft_ifft_consistency,
fft_coset_ifft_consistency, etc.).
"""

import random

import numpy as np
import jax.numpy as jnp

from aztec_tpu.ff import FR, limb
from aztec_tpu.ff.bn254 import FR_MOD
from aztec_tpu.numeric import ints_to_limbs, limbs_to_ints
from aztec_tpu.poly import EvaluationDomain, fft, ifft, coset_fft, coset_ifft

rng = random.Random(99)


def rand_poly(n):
    return [rng.randrange(FR_MOD) for _ in range(n)]


def to_dev_mont(vals):
    return limb.to_mont(jnp.asarray(ints_to_limbs(vals)), FR)


def from_dev_mont(arr):
    return limbs_to_ints(np.asarray(limb.from_mont(arr, FR)))


def naive_dft(coeffs, root, shift=1):
    n = len(coeffs)
    out = []
    for i in range(n):
        x = (shift * pow(root, i, FR_MOD)) % FR_MOD
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % FR_MOD
        out.append(acc)
    return out


def test_fft_matches_naive_dft():
    n = 16
    d = EvaluationDomain(n)
    coeffs = rand_poly(n)
    got = from_dev_mont(fft(to_dev_mont(coeffs), d))
    assert got == naive_dft(coeffs, d.root)


def test_fft_ifft_roundtrip():
    n = 256
    d = EvaluationDomain(n)
    coeffs = rand_poly(n)
    x = to_dev_mont(coeffs)
    assert from_dev_mont(ifft(fft(x, d), d)) == coeffs


def test_coset_fft_matches_naive():
    n = 16
    d = EvaluationDomain(n)
    coeffs = rand_poly(n)
    got = from_dev_mont(coset_fft(to_dev_mont(coeffs), d))
    assert got == naive_dft(coeffs, d.root, shift=d.generator)


def test_coset_fft_ifft_roundtrip():
    n = 128
    d = EvaluationDomain(n)
    coeffs = rand_poly(n)
    x = to_dev_mont(coeffs)
    assert from_dev_mont(coset_ifft(coset_fft(x, d), d)) == coeffs


def test_domain_roots():
    d = EvaluationDomain(1 << 10)
    assert pow(d.root, 1 << 10, FR_MOD) == 1
    assert pow(d.root, 1 << 9, FR_MOD) == FR_MOD - 1
    tbl = np.asarray(limb.from_mont(d.forward_roots, FR))
    vals = limbs_to_ints(tbl[:, :4])
    assert vals == [1, d.root, pow(d.root, 2, FR_MOD), pow(d.root, 3, FR_MOD)]


def test_barycentric_evaluation_matches_coefficient_eval():
    """compute_barycentric_evaluation (ref polynomial_arithmetic.cpp:814)
    from evaluation form == direct coefficient evaluation."""
    from aztec_tpu.poly.arithmetic import compute_barycentric_evaluation

    n = 16
    dom = EvaluationDomain(n)
    coeffs = rand_poly(n)
    evals = naive_dft(coeffs, dom.root)
    z = rng.randrange(FR_MOD)
    expect = 0
    for c in reversed(coeffs):
        expect = (expect * z + c) % FR_MOD
    got = compute_barycentric_evaluation(to_dev_mont(evals), z, dom)
    assert got == expect


def test_barycentric_evaluation_partial_prefix():
    """m < n evaluations: matches sum_i L_i(z) f_i over the first m
    lagranges only (the reference's num_coeffs < domain.size case)."""
    from aztec_tpu.poly.arithmetic import compute_barycentric_evaluation

    n, m = 16, 10
    dom = EvaluationDomain(n)
    fvals = rand_poly(m)
    z = rng.randrange(FR_MOD)
    num = (pow(z, n, FR_MOD) - 1) * pow(n, -1, FR_MOD) % FR_MOD
    expect = 0
    for i, f in enumerate(fvals):
        li = num * pow((z * pow(dom.root, -i, FR_MOD) - 1) % FR_MOD,
                       -1, FR_MOD) % FR_MOD
        expect = (expect + li * f) % FR_MOD
    got = compute_barycentric_evaluation(to_dev_mont(fvals), z, dom)
    assert got == expect
