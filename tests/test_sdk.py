"""SDK e2e against the sequencer pipeline (ref: sdk/src e2e with mocked
proofs — end-to-end note flow without SNARKs; the circuit-prover path is
covered by the AZTEC_HEAVY join_split/rollup tests).

deposit -> transfer -> withdraw through the full pipeline: CoreSdk builds
txs with the native prover, the sequencer batches + "publishes" them on a
LocalBlockchain, and both users recover their balances purely by viewing-
key decryption of the settled blocks.
"""

import pytest

from aztec_tpu.sdk import CoreSdk
from aztec_tpu.sdk.viewing_key import (
    ViewingKey,
    derive_keys,
    encrypt_note_for,
    try_decrypt_note,
)
from aztec_tpu.rollup.notes_native import ValueNote, encrypt_note

from test_sequencer import MockProofGenerator  # shared halloumi stand-in
from aztec_tpu.sequencer.blockchain import LocalBlockchain
from aztec_tpu.sequencer.rollup_pipeline import (
    RollupPipeline,
    SequencerConfig,
)


def test_viewing_key_roundtrip():
    priv, pub = derive_keys(b"owner seed")
    note = ValueNote(1234, 1, 0, pub, 0x5EC1E7)
    vk = encrypt_note_for(note, pub, eph_priv=0x1234)
    buf = vk.to_buffer()
    assert len(buf) == ViewingKey.WIRE_LEN
    got = try_decrypt_note(ViewingKey.from_buffer(buf), priv, pub)
    assert got is not None and got.value == 1234 and got.secret == 0x5EC1E7

    other_priv, other_pub = derive_keys(b"other")
    assert try_decrypt_note(vk, other_priv, other_pub) is None


def test_note_picker():
    from aztec_tpu.sdk.note_store import Note, NoteStore

    _, pub = derive_keys(b"u")
    s = NoteStore()
    for i, v in enumerate([5, 30, 50]):
        s.add(Note(ValueNote(v, 0, 0, pub, 1 + i), index=i))
    assert s.balance(0) == 85
    picked = s.pick(0, 40)
    assert [n.note.value for n in picked] == [50]
    picked = s.pick(0, 60)
    assert sorted(n.note.value for n in picked) == [30, 50]
    assert s.pick(0, 90) is None


def _make_env():
    cfg = SequencerConfig(num_inner_rollup_txs=1, num_outer_rollup_proofs=1,
                          publish_interval_s=1000.0, data_tree_depth=8)
    pipeline = RollupPipeline(cfg, MockProofGenerator(),
                              blockchain=LocalBlockchain())
    sdk = CoreSdk(data_tree_depth=8, prover="native")
    return pipeline, sdk


def test_sdk_deposit_transfer_withdraw_e2e():
    pipeline, sdk = _make_env()
    alice = sdk.add_user(b"alice")
    bob = sdk.add_user(b"bob")

    # empty-tree mirrors agree
    assert sdk.data_tree.root == pipeline.world_state.data_root()

    # -- alice deposits 100 --------------------------------------------------
    req = sdk.create_join_split(alice, public_input=100, tx_fee=10)
    sdk.submit(req, pipeline.tx_receiver)
    assert pipeline.coordinator.tick()
    sdk.sync(pipeline.blockchain)
    assert sdk.data_tree.root == pipeline.world_state.data_root()
    assert alice.balance() == 90  # 100 - fee
    assert bob.balance() == 0

    # -- alice transfers 30 to bob ------------------------------------------
    req = sdk.create_join_split(alice, transfer=30, recipient=bob.pub,
                                tx_fee=10)
    sdk.submit(req, pipeline.tx_receiver)
    assert pipeline.coordinator.tick()
    sdk.sync(pipeline.blockchain)
    assert bob.balance() == 30
    assert alice.balance() == 50  # 90 - 30 - fee

    # -- bob withdraws 20 ----------------------------------------------------
    req = sdk.create_join_split(bob, public_output=20, tx_fee=10)
    sdk.submit(req, pipeline.tx_receiver)
    assert pipeline.coordinator.tick()
    sdk.sync(pipeline.blockchain)
    assert bob.balance() == 0  # 30 - 20 - 10
    assert alice.balance() == 50

    # double-spend of a consumed note is rejected at the receiver
    from aztec_tpu.sequencer.tx_receiver import VerificationError

    with pytest.raises(ValueError):
        # alice only has 50; asking 80 fails in the picker
        sdk.create_join_split(alice, transfer=80, tx_fee=0)


def test_sdk_insufficient_funds():
    pipeline, sdk = _make_env()
    alice = sdk.add_user(b"alice")
    with pytest.raises(ValueError, match="insufficient"):
        sdk.create_join_split(alice, transfer=5)
