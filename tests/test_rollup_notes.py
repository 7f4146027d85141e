"""Note commitments/nullifiers: native vs in-circuit consistency
(ref: rollup/proofs/notes/*.test.cpp)."""

from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.rollup import constants as C
from aztec_tpu.rollup import notes_native as nn
from aztec_tpu.rollup import notes_circuit as nc
from aztec_tpu.stdlib import witness
from aztec_tpu.stdlib.field_t import BoolT
from aztec_tpu.crypto import pedersen as pd


OWNER_PRIV = 0x0B0B + 7
OWNER = pd.fixed_base_scalar_mul_g1(OWNER_PRIV, 254)


def _note(value=100, asset_id=1, nonce=0, secret=0xDEADBEEF1234):
    return nn.ValueNote(value=value, asset_id=asset_id, nonce=nonce,
                        owner=OWNER, secret=secret)


def test_encrypt_note_native_vs_circuit():
    note = _note()
    expected = nn.encrypt_note(note)

    c = TurboComposer()
    plaintext, enc = nc.create_note_pair(c, note)
    assert (enc.x.get_value(), enc.y.get_value()) == expected
    assert not c.failed, c.err
    assert check_turbo(c) == []


def test_encrypt_note_zero_value_skips_generator():
    note = _note(value=0, asset_id=0)
    expected = nn.encrypt_note(note)
    c = TurboComposer()
    _, enc = nc.create_note_pair(c, note)
    assert (enc.x.get_value(), enc.y.get_value()) == expected
    assert check_turbo(c) == []


def test_nullifier_native_vs_circuit():
    note = _note()
    enc = nn.encrypt_note(note)
    for is_real in (True, False):
        expected = nn.compute_nullifier(enc, 5, OWNER_PRIV, is_real)
        c = TurboComposer()
        pt = nc.Point(witness(c, enc[0]), witness(c, enc[1]))
        got = nc.compute_nullifier(pt, witness(c, 5),
                                   witness(c, OWNER_PRIV),
                                   BoolT.from_witness(c, is_real))
        assert got.get_value() == expected
        assert not c.failed, c.err
        assert check_turbo(c) == []


def test_account_note_native_vs_circuit():
    signing = pd.fixed_base_scalar_mul_g1(0x5151, 254)
    alias_id = nn.account_alias_id(0xA11A5, 1)
    expected = nn.encrypt_account_note(alias_id, OWNER, signing)

    c = TurboComposer()
    got = nc.encrypt_account_note(
        witness(c, alias_id),
        nc.Point(witness(c, OWNER[0]), witness(c, OWNER[1])),
        nc.Point(witness(c, signing[0]), witness(c, signing[1])),
    )
    assert (got.x.get_value(), got.y.get_value()) == expected
    assert check_turbo(c) == []


def test_value_note_buffer_roundtrip():
    note = _note(value=12345, asset_id=2, nonce=3)
    assert nn.ValueNote.from_buffer(note.to_buffer()) == note
