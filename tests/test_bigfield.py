"""bigfield / biggroup in-circuit tests
(ref: stdlib/primitives/bigfield/bigfield.test.cpp, biggroup.test.cpp)."""

import random

from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.stdlib.bigfield import BigField, TARGET
from aztec_tpu.stdlib.biggroup import BigGroup
from aztec_tpu.curves.pairing import g1_add, g1_dbl, g1_mul

rng = random.Random(17)


def test_bigfield_mul_and_madd():
    c = TurboComposer()
    a_v = rng.randrange(TARGET)
    b_v = rng.randrange(TARGET)
    a = BigField.from_witness(c, a_v)
    b = BigField.from_witness(c, b_v)
    prod = a * b
    assert prod.get_value() % TARGET == a_v * b_v % TARGET
    s = prod + a + b
    t = s.madd(a, [b])
    assert t.get_value() % TARGET == (
        (a_v * b_v % TARGET + a_v + b_v) * a_v + b_v
    ) % TARGET
    assert not c.failed
    assert check_turbo(c) == []


def test_bigfield_sub():
    c = TurboComposer()
    a = BigField.from_witness(c, 5)
    b = BigField.from_witness(c, TARGET - 3)
    d = (a - b).reduce()
    assert d.get_value() % TARGET == 8 % TARGET
    assert check_turbo(c) == []


def test_biggroup_add_dbl():
    c = TurboComposer()
    P = g1_mul(7, (1, 2))
    Q = g1_mul(11, (1, 2))
    gp = BigGroup.from_witness(c, P)
    gq = BigGroup.from_witness(c, Q)
    assert gp.add(gq, c).get_value() == g1_add(P, Q)
    assert gp.dbl(c).get_value() == g1_dbl(P)
    assert not c.failed
    assert check_turbo(c) == []
