"""stdlib field_t/bool_t tests through a full prove/verify cycle
(ref: stdlib/primitives/field/field.test.cpp, bool/bool.test.cpp)."""

import pytest

from aztec_tpu.ff.bn254 import FR_MOD
from aztec_tpu.plonk.composer import StandardComposer
from aztec_tpu.stdlib import FieldT, BoolT, witness, constant, public_witness


def test_field_lazy_constant_composition_no_gates():
    c = StandardComposer()
    base_gates = c.n
    a = witness(c, 7)
    b = a * 3 + 5  # constant composition: no gates
    assert c.n == base_gates
    assert b.get_value() == 26
    d = b - 6
    assert d.get_value() == 20
    assert c.n == base_gates


def test_field_arithmetic_values():
    c = StandardComposer()
    a = witness(c, 7)
    b = witness(c, 11)
    prod = (a * 2 + 1) * (b - 1)  # (15)*(10) = 150
    assert prod.get_value() == 150
    q = prod / (witness(c, 30))
    assert q.get_value() == 5
    inv = a.invert()
    assert inv.get_value() == pow(7, -1, FR_MOD)
    assert not c.failed


def test_bool_algebra():
    c = StandardComposer()
    t = BoolT.from_witness(c, True)
    f = BoolT.from_witness(c, False)
    assert (t & f).get_value() is False
    assert (t | f).get_value() is True
    assert (t ^ t).get_value() is False
    assert (~f).get_value() is True
    assert ((~f) & t).get_value() is True
    assert not c.failed


@pytest.mark.slow
def test_stdlib_circuit_proves_and_verifies():
    # sized for subgroup 16 (shared compile cache, see PERF.md)
    c = StandardComposer()
    c.create_dummy_gates()
    x = public_witness(c, 5)
    y = witness(c, 9)
    z = x * y + x - 3  # 47
    z.assert_equal(constant(47))
    assert not c.failed, c.err
    assert c.subgroup_size() == 16
    proof = c.create_prover().construct_proof()
    assert c.create_verifier().verify_proof(proof)
