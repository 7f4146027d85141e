"""TurboPlonk end-to-end tests (ref: plonk/composer/turbo_composer.test.cpp)."""

import pytest

from aztec_tpu.ff.bn254 import FR_MOD
from aztec_tpu.plonk.composer import TurboComposer, AddTriple, MulTriple


def _build_turbo_circuit():
    c = TurboComposer()
    a = c.add_variable(5)
    b = c.add_variable(7)
    prod = c.add_variable(35)
    c.create_mul_gate(MulTriple(a, b, prod, 1, -1, 0))
    s = c.add_variable(12)
    c.create_add_gate(AddTriple(a, b, s, 1, 1, -1, 0))
    # width-4 gate: a + b + prod + s = 59
    q = c.add_variable(59)
    c.create_big_add_gate(a, b, prod, s, 1, 1, 1, 1, -59)
    c.assert_equal(q, c.put_constant_variable(59), "const")
    # range constraint: 12 fits in 8 bits
    c.create_range_constraint(s, 8)
    # logic: 5 & 7 = 5; 5 ^ 7 = 2 over 4 bits
    c.create_and_constraint(a, b, 4)
    c.create_xor_constraint(a, b, 4)
    pub = c.add_public_variable(0xDEAD)
    assert not c.failed, c.err
    return c


@pytest.fixture(scope="module")
def turbo_proof():
    c = _build_turbo_circuit()
    prover = c.create_prover()
    proof = prover.construct_proof()
    return proof, c


def test_turbo_proof_verifies(turbo_proof):
    proof, c = turbo_proof
    assert c.create_verifier().verify_proof(proof)


def test_turbo_tamper_rejected(turbo_proof):
    proof, c = turbo_proof
    v = c.create_verifier()
    bad = bytearray(proof)
    bad[len(bad) // 3] ^= 1
    ok = False
    try:
        ok = v.verify_proof(bytes(bad))
    except Exception:
        ok = False
    assert not ok
