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


@pytest.mark.skipif(not HEAVY, reason="subgroup-512 proof; set AZTEC_HEAVY=1")
def test_pedersen_circuit_proof_verifies():
    c = TurboComposer()
    out = compress(witness(c, 1), witness(c, 2))
    out.assert_equal(pd.compress_native(1, 2))
    assert not c.failed, c.err
    proof = c.create_prover().construct_proof()
    assert c.create_verifier().verify_proof(proof)
