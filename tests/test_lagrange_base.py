"""Lagrange-base transformation test (ref: lagrange_base.test.cpp)."""

from aztec_tpu.curves.pairing import g1_mul
from aztec_tpu.ff.bn254 import FR_MOD
from aztec_tpu.poly.domain import EvaluationDomain
from aztec_tpu.srs.lagrange_base import transform_srs

M = FR_MOD


def test_transform_srs_matches_direct_lagrange_commitments():
    n = 8
    tau = 0xBEEF1234
    monomials = [g1_mul(pow(tau, i, M), (1, 2)) for i in range(n)]
    lag = transform_srs(monomials)

    # direct: L_i(tau) via barycentric over the domain
    d = EvaluationDomain(n)
    root = d.root
    for i in range(n):
        w_i = pow(root, i, M)
        # L_i(x) = w_i (x^n - 1) / (n (x - w_i))
        li = (pow(tau, n, M) - 1) * w_i % M
        li = li * pow(n * (tau - w_i) % M, -1, M) % M
        assert lag[i] == g1_mul(li, (1, 2)), i
