"""uint32 stdlib tests over the TurboComposer (ref: stdlib/primitives/uint)."""

import pytest

from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.stdlib.uint32 import UInt32

A = 0xDEADBEEF
B = 0x12345678


@pytest.fixture()
def ctx():
    return TurboComposer()


def _u(ctx, v):
    return UInt32.from_witness(ctx, v)


def test_add_sub_values(ctx):
    a, b = _u(ctx, A), _u(ctx, B)
    assert (a + b).get_value() == (A + B) & 0xFFFFFFFF
    assert (a - b).get_value() == (A - B) & 0xFFFFFFFF
    assert (b - a).get_value() == (B - A) & 0xFFFFFFFF
    assert not ctx.failed


def test_bitwise_values(ctx):
    a, b = _u(ctx, A), _u(ctx, B)
    assert (a & b).get_value() == A & B
    assert (a ^ b).get_value() == A ^ B
    assert (a | b).get_value() == A | B
    assert (~a).get_value() == (~A) & 0xFFFFFFFF
    assert not ctx.failed


def test_rotations_and_shifts(ctx):
    a = _u(ctx, A)
    for k in (1, 7, 13, 31):
        assert a.ror(k).get_value() == ((A >> k) | (A << (32 - k))) & 0xFFFFFFFF
        assert a.rol(k).get_value() == ((A << k) | (A >> (32 - k))) & 0xFFFFFFFF
        assert (a >> k).get_value() == A >> k
        assert (a << k).get_value() == (A << k) & 0xFFFFFFFF
    assert not ctx.failed
