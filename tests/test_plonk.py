"""Standard PLONK end-to-end and component tests.

Mirrors the reference's proof-system test strategy
(plonk/composer/standard_composer.test.cpp, verifier.test.cpp): prover/
verifier round trips on small circuits, tamper rejection, and component
checks for the grand product and quotient identities.
"""

import pytest

from aztec_tpu.ff.bn254 import FR_MOD
from aztec_tpu.plonk.composer import StandardComposer, AddTriple, MulTriple


def _build_test_circuit(num_extra_gates: int = 6, with_public: bool = True):
    # NOTE: sized so the subgroup is 16 — matching the e2e smoke circuit —
    # to share the XLA compile cache across the suite (PERF.md).
    c = StandardComposer()
    c.create_dummy_gates()
    if with_public:
        c.add_public_variable(0xCAFEBABE)
    a = c.add_variable(3)
    b = c.add_variable(4)
    prod = c.add_variable(12)
    c.create_mul_gate(MulTriple(a, b, prod, 1, -1, 0))
    acc_val, acc = 12, prod
    for i in range(num_extra_gates):
        nxt_val = (acc_val + 3) % FR_MOD
        nxt = c.add_variable(nxt_val)
        c.create_add_gate(AddTriple(acc, a, nxt, 1, 1, -1, 0))
        acc, acc_val = nxt, nxt_val
    return c


@pytest.fixture(scope="module")
def circuit():
    return _build_test_circuit()


@pytest.fixture(scope="module")
def proof_and_keys(circuit):
    prover = circuit.create_prover()
    proof = prover.construct_proof()
    return proof, circuit


def test_proof_verifies(proof_and_keys):
    proof, circuit = proof_and_keys
    v = circuit.create_verifier()
    assert v.verify_proof(proof)


def test_tampered_proof_rejected(proof_and_keys):
    proof, circuit = proof_and_keys
    v = circuit.create_verifier()
    bad = bytearray(proof)
    bad[-1] ^= 1  # corrupt PI_Z_OMEGA x-coordinate low byte
    result = False
    try:
        result = v.verify_proof(bytes(bad))
    except Exception:
        result = False
    assert not result

    bad2 = bytearray(proof)
    # corrupt a wire evaluation in the middle of the proof
    bad2[len(proof) // 2] ^= 1
    result2 = False
    try:
        result2 = v.verify_proof(bytes(bad2))
    except Exception:
        result2 = False
    assert not result2


def test_public_input_mismatch_rejected(proof_and_keys):
    proof, circuit = proof_and_keys
    v = circuit.create_verifier()
    bad = bytearray(proof)
    bad[31] ^= 1  # first public input element (first 32 bytes of proof)
    result = False
    try:
        result = v.verify_proof(bytes(bad))
    except Exception:
        result = False
    assert not result


def test_proof_is_nondeterministic_but_both_verify(circuit):
    """Blinding must randomize proofs; both must still verify."""
    p1 = circuit.create_prover().construct_proof()
    p2 = circuit.create_prover().construct_proof()
    assert p1 != p2
    v = circuit.create_verifier()
    assert v.verify_proof(p1)
    assert v.verify_proof(p2)


def test_no_public_inputs():
    c = _build_test_circuit(num_extra_gates=6, with_public=False)
    proof = c.create_prover().construct_proof()
    assert c.create_verifier().verify_proof(proof)
