"""In-circuit Schnorr verification vs the native signer."""

import pytest

from aztec_tpu.crypto import schnorr as native
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.stdlib.group_native import (
    NativePoint, batch_mul_native, bits_from_bytes_be,
)
from aztec_tpu.stdlib.field_t import FieldT
from aztec_tpu.stdlib.schnorr_circuit import verify_signature
from aztec_tpu.crypto.pedersen import GRUMPKIN_GEN, g_mul


def test_native_point_ops():
    c = TurboComposer()
    P = g_mul(12345, GRUMPKIN_GEN)
    Q = g_mul(777, GRUMPKIN_GEN)
    a = NativePoint.from_witness(c, P)
    b = NativePoint.from_witness(c, Q)
    from aztec_tpu.crypto.pedersen import g_add

    assert a.add(b).get_value() == g_add(P, Q)
    assert a.dbl().get_value() == g_add(P, P)
    assert not c.failed, c.err
    assert check_turbo(c) == []


def test_batch_mul_native_small():
    c = TurboComposer()
    P = g_mul(31337, GRUMPKIN_GEN)
    s1, s2 = 0xBEEF, 0x1234
    b1 = [FieldT.from_witness(c, (s1 >> i) & 1) for i in range(16)]
    b2 = [FieldT.from_witness(c, (s2 >> i) & 1) for i in range(16)]
    for b in b1 + b2:
        c.create_bool_gate(b.witness_index)
    G = NativePoint.from_constant(GRUMPKIN_GEN)
    Pw = NativePoint.from_witness(c, P)
    out = batch_mul_native(c, [G, Pw], [b1, b2])
    from aztec_tpu.crypto.pedersen import g_add

    expected = g_add(g_mul(s1, GRUMPKIN_GEN), g_mul(s2, P))
    assert out.get_value() == expected
    assert check_turbo(c) == []


@pytest.mark.slow
def test_schnorr_circuit_accepts_valid_signature():
    priv = 0x5EC7E7
    pub = native.derive_public_key(priv)
    msg = b"the quick brown fox"
    sig = native.construct_signature(msg, priv, k=0xABCDEF0123)
    assert native.verify_signature(msg, pub, sig)

    c = TurboComposer()
    verify_signature(c, msg, pub, sig)
    assert not c.failed, c.err
    assert check_turbo(c) == []


@pytest.mark.slow
def test_schnorr_circuit_rejects_bad_signature():
    priv = 0x5EC7E7
    pub = native.derive_public_key(priv)
    msg = b"the quick brown fox"
    sig = native.construct_signature(msg, priv, k=0xABCDEF0123)
    bad = (sig[0], bytes([sig[1][0] ^ 1]) + sig[1][1:])

    c = TurboComposer()
    try:
        verify_signature(c, msg, pub, bad)
        violated = c.failed or check_turbo(c) != []
    except Exception:
        violated = True
    assert violated
