"""In-circuit Pedersen hash (ref: stdlib/hash/pedersen/pedersen.test.cpp).

Heavy: the circuit has ~260 gates -> subgroup 512; gated like the
reference's HEAVY_TEST macro (common/test.hpp:4-9).  Run with
AZTEC_HEAVY=1.
"""

import os

import pytest

from aztec_tpu.crypto import pedersen as pd
from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.stdlib import witness
from aztec_tpu.stdlib.pedersen_circuit import hash_single, compress

HEAVY = os.environ.get("AZTEC_HEAVY") == "1"


def test_circuit_hash_matches_native_value():
    from aztec_tpu.plonk.circuit_check import check_turbo

    c = TurboComposer()
    x = witness(c, 123456789)
    hx, hy = hash_single(x, 0)
    native = pd.hash_single(123456789, 0)
    assert (hx.get_value(), hy.get_value()) == native
    assert not c.failed, c.err
    assert check_turbo(c) == []


def test_circuit_compress_matches_native_value():
    from aztec_tpu.plonk.circuit_check import check_turbo

    c = TurboComposer()
    out = compress(witness(c, 1), witness(c, 2))
    assert out.get_value() == pd.compress_native(1, 2)
    assert not c.failed, c.err
    assert check_turbo(c) == []


def test_fixed_base_scalar_mul_circuit():
    from aztec_tpu.plonk.circuit_check import check_turbo
    from aztec_tpu.stdlib.pedersen_circuit import (
        fixed_base_scalar_mul, fixed_base_scalar_mul_g1)

    c = TurboComposer()
    v = 0xDEADBEEFCAFE
    p = fixed_base_scalar_mul(witness(c, v), 252, 2)
    assert p.get_value() == pd.fixed_base_scalar_mul(v, 252, 2)
    g = fixed_base_scalar_mul_g1(witness(c, v), 254)
    assert g.get_value() == pd.fixed_base_scalar_mul_g1(v, 254)
    assert not c.failed, c.err
    assert check_turbo(c) == []


def test_encrypt_circuit_matches_native_with_zero_inputs():
    from aztec_tpu.plonk.circuit_check import check_turbo
    from aztec_tpu.stdlib.pedersen_circuit import encrypt

    # zero inputs exercise conditionally_accumulate's skip path
    # (ref: pedersen.cpp conditionally_accumulate + encrypt_native)
    for vals in ([5, 0, 7], [3, 9], [0, 4, 0, 11]):
        c = TurboComposer()
        pt = encrypt([witness(c, v) for v in vals], 7,
                     handle_edge_cases=True)
        assert pt.get_value() == pd.encrypt_native(vals, 7)
        assert not c.failed, c.err
        assert check_turbo(c) == []


def test_is_zero_circuit():
    from aztec_tpu.plonk.circuit_check import check_turbo

    c = TurboComposer()
    z = witness(c, 0).is_zero()
    nz = witness(c, 42).is_zero()
    assert z.get_value() is True and nz.get_value() is False
    witness(c, 42).assert_is_not_zero()
    assert not c.failed, c.err
    assert check_turbo(c) == []


@pytest.mark.skipif(not HEAVY, reason="subgroup-512 proof; set AZTEC_HEAVY=1")
def test_pedersen_circuit_proof_verifies():
    c = TurboComposer()
    out = compress(witness(c, 1), witness(c, 2))
    out.assert_equal(pd.compress_native(1, 2))
    assert not c.failed, c.err
    proof = c.create_prover().construct_proof()
    assert c.create_verifier().verify_proof(proof)
