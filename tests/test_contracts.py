"""RollupProcessor tests (ref: blockchain/test/rollup_processor tests):
escrow accounting, state chaining, provider gating, escape hatch, and the
full sequencer -> processor publish loop.
"""

import pytest

from aztec_tpu.contracts import RollupProcessor
from aztec_tpu.contracts.rollup_processor import RollupProcessorError
from aztec_tpu.sequencer.rollup_pipeline import (
    RollupPipeline,
    SequencerConfig,
)

from test_sequencer import MockProofGenerator, make_tx_proof


def make_env(**cfg):
    config = SequencerConfig(publish_interval_s=1000.0, **cfg)
    proc = RollupProcessor()
    p = RollupPipeline(config, MockProofGenerator(), blockchain=proc)
    return p, proc


def test_deposit_escrow_and_withdraw_flow():
    p, proc = make_env(num_inner_rollup_txs=2, num_outer_rollup_proofs=1)
    ws = p.world_state

    # user "aa" escrows 100 of asset 1
    proc.deposit_pending_funds(1, 100, format(0xAA, "x"))
    assert proc.get_user_pending_deposit(1, "aa") == 100

    # deposit tx: public_input=60 from 0xAA; withdraw tx: 30 to 0xBB
    dep = bytearray(make_tx_proof(ws, 1, 2))
    F = __import__("aztec_tpu.rollup.inner_proof_data",
                   fromlist=["InnerProofFields"]).InnerProofFields
    def setf(buf, i, v):
        buf[i * 32:(i + 1) * 32] = v.to_bytes(32, "big")
    setf(dep, F.PUBLIC_INPUT, 60)
    setf(dep, F.ASSET_ID, 1)
    setf(dep, F.INPUT_OWNER, 0xAA)
    wd = bytearray(make_tx_proof(ws, 3, 4))
    setf(wd, F.PUBLIC_OUTPUT, 30)
    setf(wd, F.ASSET_ID, 1)
    setf(wd, F.OUTPUT_OWNER, 0xBB)

    p.tx_receiver.receive_tx(bytes(dep))
    p.tx_receiver.receive_tx(bytes(wd))
    assert p.coordinator.tick()

    assert proc.get_user_pending_deposit(1, "aa") == 40  # 100 - 60
    assert proc.get_user_balance(1, "bb") == 30
    assert proc.next_rollup_id == 1
    assert proc.data_root == ws.data_root()
    assert ("RollupProcessed", 0, proc.data_root, proc.null_root,
            proc.root_root) in proc.events


def test_insufficient_deposit_reverts_rollup():
    p, proc = make_env(num_inner_rollup_txs=1, num_outer_rollup_proofs=1)
    ws = p.world_state
    F = __import__("aztec_tpu.rollup.inner_proof_data",
                   fromlist=["InnerProofFields"]).InnerProofFields
    dep = bytearray(make_tx_proof(ws, 1, 2))
    dep[F.PUBLIC_INPUT * 32:(F.PUBLIC_INPUT + 1) * 32] = \
        (60).to_bytes(32, "big")
    dep[F.INPUT_OWNER * 32:(F.INPUT_OWNER + 1) * 32] = \
        (0xAA).to_bytes(32, "big")
    p.tx_receiver.receive_tx(bytes(dep))
    # no escrowed funds: publish fails, pipeline resets + tx released
    assert not p.coordinator.tick()
    assert p.db.get_pending_tx_count() == 1
    assert proc.next_rollup_id == 0


def test_state_chaining_two_rollups():
    p, proc = make_env(num_inner_rollup_txs=1, num_outer_rollup_proofs=1)
    ws = p.world_state
    p.tx_receiver.receive_tx(make_tx_proof(ws, 1, 2))
    assert p.coordinator.tick()
    p.tx_receiver.receive_tx(make_tx_proof(ws, 3, 4))
    assert p.coordinator.tick()
    assert proc.next_rollup_id == 2
    assert proc.data_root == ws.data_root()
    assert len(proc.blocks) == 2


def test_provider_gating_and_escape_hatch():
    proc = RollupProcessor()
    with pytest.raises(RollupProcessorError, match="INVALID_PROVIDER"):
        proc.process_rollup(bytes(32 * 20), provider="mallory")
    open_, until = proc.get_escape_hatch_status()
    assert not open_
    proc.block_height = 85  # inside [80, 100)
    open_, until = proc.get_escape_hatch_status()
    assert open_ and until == 15


def test_bad_chaining_rejected():
    proc = RollupProcessor()
    # a first rollup of size 1 at start 0
    head = [0, 1, 0, 11, 22, 33, 44, 55, 66] + [0] * 4 + [1]
    proof = b"".join(v.to_bytes(32, "big") for v in head) + bytes(12 * 32)
    proc.process_rollup(proof)
    # second rollup with wrong old_data_root
    head2 = [1, 1, 2, 999, 23, 44, 45, 66, 77] + [0] * 4 + [1]
    proof2 = b"".join(v.to_bytes(32, "big") for v in head2) + bytes(12 * 32)
    with pytest.raises(RollupProcessorError, match="INCORRECT_DATA_ROOT"):
        proc.process_rollup(proof2)
    # and wrong data start index
    head3 = [1, 1, 5, 22, 23, 44, 45, 66, 77] + [0] * 4 + [1]
    proof3 = b"".join(v.to_bytes(32, "big") for v in head3) + bytes(12 * 32)
    with pytest.raises(RollupProcessorError,
                       match="INCORRECT_DATA_START_INDEX"):
        proc.process_rollup(proof3)


def test_escape_hatch_submission():
    proc = RollupProcessor()
    head = [0, 1, 0, 11, 22, 33, 44, 55, 66] + [0] * 4 + [1]
    proof = b"".join(v.to_bytes(32, "big") for v in head) + bytes(12 * 32)
    # closed window: rejected
    with pytest.raises(RollupProcessorError, match="ESCAPE_BLOCK_RANGE"):
        proc.escape_hatch(proof)
    # open window: accepted from a non-provider
    proc.block_height = 85
    proc.escape_hatch(proof)
    assert proc.next_rollup_id == 1
