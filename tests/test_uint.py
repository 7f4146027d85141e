"""Width-generic uint8/16/64 tests (uint32 is covered by test_uint32 +
blake2s); all checks are constraint-satisfaction based (no proving)."""

import secrets

import pytest

from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.stdlib.uint import UInt8, UInt16, UInt64


@pytest.mark.parametrize("cls", [UInt8, UInt16, UInt64])
def test_uint_ops(cls):
    W = cls.WIDTH
    mask = (1 << W) - 1
    c = TurboComposer()
    a_v = secrets.randbits(W)
    b_v = secrets.randbits(W)
    a = cls.from_witness(c, a_v)
    b = cls.from_witness(c, b_v)

    assert (a + b).get_value() == (a_v + b_v) & mask
    assert (a - b).get_value() == (a_v - b_v) & mask
    assert (a * b).get_value() == (a_v * b_v) & mask
    assert (a & b).get_value() == a_v & b_v
    assert (a ^ b).get_value() == a_v ^ b_v
    assert (a | b).get_value() == a_v | b_v
    assert (~a).get_value() == (~a_v) & mask
    k = (a_v % (W - 1)) + 1
    assert a.ror(k).get_value() == ((a_v >> k) | (a_v << (W - k))) & mask
    assert a.rol(k).get_value() == ((a_v << k) | (a_v >> (W - k))) & mask
    assert (a >> k).get_value() == a_v >> k
    assert (a << k).get_value() == (a_v << k) & mask

    assert not c.failed, c.err
    assert check_turbo(c) == []


def test_uint_wrap_edges():
    c = TurboComposer()
    m8 = UInt8.from_witness(c, 0xFF)
    one = UInt8.from_witness(c, 1)
    assert (m8 + one).get_value() == 0
    zero = UInt8.from_witness(c, 0)
    assert (zero - one).get_value() == 0xFF
    m64 = UInt64.from_witness(c, (1 << 64) - 1)
    assert (m64 * m64).get_value() == 1  # (2^64-1)^2 mod 2^64 = 1
    assert check_turbo(c) == []
