"""UltraPlonk (plookup) prover/verifier roundtrip tests.

BASELINE config 5 first half: plookup roundtrip with RANGE and XOR tables
(the reference snapshot only reserves the slots — polynomial_manifest.hpp:
23-46, lookup_tables.md — so these tests pin OUR protocol down; there are
no reference vectors to match).
"""

import pytest

from aztec_tpu.plonk.composer import AddTriple, MulTriple, UltraComposer
from aztec_tpu.plonk.lookup_tables import range_table, xor_table, and_table


def _finish(composer):
    assert not composer.failed, composer.err
    prover = composer.create_prover()
    proof = prover.construct_proof()
    verifier = composer.create_verifier()
    assert verifier.verify_proof(proof), "ultra proof rejected"
    return proof


def test_ultra_range_lookup_roundtrip():
    c = UltraComposer()
    c.add_lookup_table(range_table(4, index=1))
    for v in (0, 3, 15, 9):
        idx = c.add_variable(v)
        c.create_lookup_gate(idx, c.zero_idx, c.zero_idx, 1)
    # some arithmetic alongside, sharing witnesses
    a = c.add_variable(3)
    b = c.add_variable(9)
    s = c.add_variable(12)
    c.create_add_gate(AddTriple(a, b, s, 1, 1, -1, 0))
    _finish(c)


def test_ultra_xor_lookup_roundtrip():
    # xor_table(2) keeps the subgroup at 32 — sharing one compile-cache
    # shape across the ultra tests matters on the XLA:CPU test box
    c = UltraComposer()
    c.add_lookup_table(xor_table(2, index=2))
    out = c.read_from_table(2, c.add_variable(1), c.add_variable(3))
    assert c.get_variable(out) == 1 ^ 3
    out2 = c.read_from_table(2, c.add_variable(3), c.add_variable(3))
    assert c.get_variable(out2) == 0
    _finish(c)


def test_ultra_multi_table_roundtrip():
    c = UltraComposer()
    c.add_lookup_table(range_table(3, index=1))
    c.add_lookup_table(and_table(2, index=3))
    c.create_lookup_gate(c.add_variable(6), c.zero_idx, c.zero_idx, 1)
    out = c.read_from_table(3, c.add_variable(3), c.add_variable(2))
    assert c.get_variable(out) == 3 & 2
    _finish(c)


def test_ultra_range_decomposition():
    c = UltraComposer()
    c.add_lookup_table(range_table(4, index=1))
    v = c.add_variable(0xAB)  # 8 bits = 2 chunks of 4
    c.create_range_constraint_via_lookup(v, 1, 2, 4)
    _finish(c)


def test_ultra_no_tables_degenerates_to_turbo():
    c = UltraComposer()
    a = c.add_variable(2)
    b = c.add_variable(5)
    p = c.add_variable(10)
    c.create_mul_gate(MulTriple(a, b, p, 1, -1, 0))
    _finish(c)


def test_ultra_bad_lookup_rejected():
    c = UltraComposer()
    c.add_lookup_table(range_table(3, index=1))
    idx = c.add_variable(11)  # 11 >= 2^3: not in the table
    c.create_lookup_gate(idx, c.zero_idx, c.zero_idx, 1)
    assert not c.failed  # host does not pre-check raw lookup gates
    prover = c.create_prover()
    with pytest.raises(ValueError):
        prover.construct_proof()


def test_ultra_public_inputs():
    c = UltraComposer()
    c.add_lookup_table(range_table(4, index=1))
    x = c.add_public_variable(7)
    c.create_lookup_gate(x, c.zero_idx, c.zero_idx, 1)
    y = c.add_variable(14)
    c.create_add_gate(AddTriple(x, x, y, 1, 1, -1, 0))
    _finish(c)


def test_unrolled_ultra_roundtrip():
    """Recursion-flavor ultra proof (Pedersen+Blake2s, 16-byte challenges)
    roundtrips natively and exposes pairing accumulators — the inner half
    of BASELINE config 5 (UltraPlonk + recursive aggregation)."""
    c = UltraComposer()
    c.add_lookup_table(xor_table(2, index=2))
    out = c.read_from_table(2, c.add_variable(2), c.add_variable(3))
    assert c.get_variable(out) == 2 ^ 3
    a = c.add_variable(4)
    b = c.add_variable(6)
    p = c.add_variable(24)
    c.create_mul_gate(MulTriple(a, b, p, 1, -1, 0))
    assert not c.failed, c.err
    prover = c.create_unrolled_prover()
    assert prover.settings.name == "unrolled_ultra"
    assert prover.settings.hash_type == "pedersen_blake2s"
    proof = prover.construct_proof()
    nv = c.create_unrolled_verifier()
    assert nv.verify_proof(proof), "unrolled-ultra proof rejected"
    assert nv.pairing_inputs(proof) is not None
    # the keccak-flavor verifier must NOT accept it (different transcript)
    assert not c.create_verifier().verify_proof(proof)
