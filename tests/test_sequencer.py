"""Sequencer tests (ref: falafel/src/pipeline_coordinator.test.ts,
rollup_db/rollup_db.test.ts — mocked proof generation, real db/pipeline).

No circuits are proven here: the MockProofGenerator plays halloumi's role,
returning structurally-valid rollup proofs; AZTEC_HEAVY e2e with real
proofs lives in test_rollup_e2e.py / test_serving.py.
"""

import struct
import time

import pytest

from aztec_tpu.rollup.inner_proof_data import InnerProofFields
from aztec_tpu.rollup.serialize import read_rollup_tx
from aztec_tpu.sequencer import (
    Metrics,
    RollupDb,
    TxDao,
    TxFeeResolver,
    TxReceiver,
)
from aztec_tpu.sequencer.blockchain import LocalBlockchain
from aztec_tpu.sequencer.rollup_db import tx_id
from aztec_tpu.sequencer.rollup_pipeline import (
    RollupPipeline,
    SequencerConfig,
)
from aztec_tpu.sequencer.tx_receiver import VerificationError

F = InnerProofFields


def make_tx_proof(ws, n1: int, n2: int, fee: int = 10) -> bytes:
    """Structurally-valid tx proof: 14 public-input fields + opaque tail."""
    fields = [0] * F.NUM_FIELDS
    fields[F.PROOF_ID] = 0
    fields[F.NEW_NOTE1_X] = 0x1111 + n1
    fields[F.NEW_NOTE1_Y] = 0x2222 + n1
    fields[F.NEW_NOTE2_X] = 0x3333 + n2
    fields[F.NEW_NOTE2_Y] = 0x4444 + n2
    fields[F.NULLIFIER1] = n1
    fields[F.NULLIFIER2] = n2
    fields[F.MERKLE_ROOT] = ws.data_root()
    fields[F.TX_FEE] = fee
    return b"".join(v.to_bytes(32, "big") for v in fields) + b"\xAA" * 64


def _parse_mock_inner(proof: bytes) -> dict:
    f = lambda i: int.from_bytes(proof[i * 32:(i + 1) * 32], "big")
    size = f(1)
    base = 8 * 32
    return {
        "size": size, "start": f(2), "old_data_root": f(3),
        "new_data_root": f(4), "old_null_root": f(5), "new_null_root": f(6),
        "txs": proof[base:base + size * F.NUM_PUBLISHED * 32],
    }


class MockProofGenerator:
    """halloumi stand-in: echoes structurally-valid rollup proofs."""

    def __init__(self):
        self.calls = []
        self.fail_next = 0

    def create_proof(self, frame: bytes) -> bytes:
        proof_id = struct.unpack(">I", frame[:4])[0]
        self.calls.append(proof_id)
        if self.fail_next > 0:
            self.fail_next -= 1
            raise RuntimeError("injected proof failure")
        if proof_id == 0:
            num_txs = struct.unpack(">I", frame[4:8])[0]
            blen = struct.unpack(">I", frame[8:12])[0]
            tx = read_rollup_tx(frame[12:12 + blen])
            fields = [0, num_txs, tx.data_start_index, tx.old_data_root,
                      tx.new_data_root, tx.old_null_root,
                      tx.new_null_roots[-1], tx.data_roots_root]
            # append each tx's 12 published fields (rollup publics shape),
            # zero-padded to the full rollup size
            slots = list(tx.txs) + [b""] * (num_txs - len(tx.txs))
            tail = b"".join(p[:F.NUM_PUBLISHED * 32].ljust(
                F.NUM_PUBLISHED * 32, b"\0") for p in slots)
            return (b"".join(v.to_bytes(32, "big") for v in fields)
                    + tail + b"\xBB" * 32)
        if proof_id == 1:
            # root rollup proof: 14 header fields + 12 per tx (the layout
            # root_rollup_circuit publishes / RollupProcessor decodes)
            from aztec_tpu.rollup.serialize import read_root_rollup_tx
            from aztec_tpu.rollup.constants import NUM_ASSETS

            off = 12
            vlen = struct.unpack(">I", frame[off:off + 4])[0]
            off += 4 + vlen
            blen = struct.unpack(">I", frame[off:off + 4])[0]
            tx = read_root_rollup_tx(frame[off + 4:off + 4 + blen])
            inners = [_parse_mock_inner(p) for p in tx.rollups]
            first, last = inners[0], inners[-1]
            total_size = sum(i["size"] for i in inners)
            head = [tx.rollup_id, total_size, first["start"],
                    first["old_data_root"], last["new_data_root"],
                    first["old_null_root"], last["new_null_root"],
                    tx.old_data_roots_root, tx.new_data_roots_root]
            head += [0] * NUM_ASSETS + [len(inners)]
            txs_tail = b"".join(i["txs"] for i in inners)
            return (b"".join(v.to_bytes(32, "big") for v in head)
                    + txs_tail + b"\xDD" * 32)
        raise ValueError(proof_id)

    def reset(self):
        pass


def make_pipeline(**cfg):
    config = SequencerConfig(publish_interval_s=1000.0, **cfg)
    gen = MockProofGenerator()
    chain = LocalBlockchain()
    p = RollupPipeline(config, gen, blockchain=chain)
    return p, gen, chain


# ---------------------------- rollup db ------------------------------------

def test_rollup_db_tx_lifecycle():
    db = RollupDb()
    t = TxDao(id=b"t1", proof_data=b"p", nullifier1=b"n1", nullifier2=b"n2",
              created=time.time())
    db.add_tx(t)
    assert db.get_tx(b"t1").proof_data == b"p"
    assert db.get_pending_tx_count() == 1
    assert db.nullifiers_exist(b"n1")
    assert db.nullifiers_exist(b"zz", b"n2")
    assert not db.nullifiers_exist(b"zz")

    from aztec_tpu.sequencer.rollup_db import RollupProofDao, RollupDao

    db.add_rollup_proof(RollupProofDao(
        id=b"rp1", tx_ids=[b"t1"], proof_data=b"rp", rollup_size=2,
        data_start_index=0, created=time.time()))
    assert db.get_pending_tx_count() == 0
    assert db.get_rollup_proof(b"rp1").tx_ids == [b"t1"]

    # orphaned proof deleted on reset -> tx released
    db.delete_orphaned_rollup_proofs()
    assert db.get_pending_tx_count() == 1
    assert db.get_rollup_proof(b"rp1") is None

    # attach to a rollup, settle, check settled queries
    db.add_rollup_proof(RollupProofDao(
        id=b"rp2", tx_ids=[b"t1"], proof_data=b"rp", rollup_size=2,
        data_start_index=0, created=time.time()))
    db.add_rollup(RollupDao(id=0, data_root=b"dr", proof_data=b"pp",
                            created=time.time()), [b"rp2"])
    assert db.get_next_rollup_id() == 1
    assert db.get_last_settled_rollup() is None
    db.confirm_mined(0, b"hash")
    assert db.get_last_settled_rollup().id == 0
    assert db.get_unsettled_tx_count() == 0

    # unsettled rollups deleted on reset, settled ones kept
    db.add_rollup(RollupDao(id=1, data_root=b"dr", proof_data=b"pp",
                            created=time.time()), [])
    db.delete_unsettled_rollups()
    assert db.get_rollup(1) is None
    assert db.get_rollup(0) is not None


# ---------------------------- tx receiver ----------------------------------

def test_tx_receiver_admission():
    p, gen, chain = make_pipeline()
    ws = p.world_state
    rx = p.tx_receiver

    good = make_tx_proof(ws, 5, 6)
    txid = rx.receive_tx(good)
    assert txid == tx_id(good)

    with pytest.raises(VerificationError, match="duplicate tx"):
        rx.receive_tx(good)
    with pytest.raises(VerificationError, match="nullifier already used"):
        rx.receive_tx(make_tx_proof(ws, 5, 7))
    with pytest.raises(VerificationError, match="insufficient fee"):
        rx.receive_tx(make_tx_proof(ws, 8, 9, fee=1))
    with pytest.raises(VerificationError, match="duplicate nullifier"):
        rx.receive_tx(make_tx_proof(ws, 10, 10))

    bad_root = bytearray(make_tx_proof(ws, 11, 12))
    bad_root[F.MERKLE_ROOT * 32:(F.MERKLE_ROOT + 1) * 32] = b"\x07" * 32
    with pytest.raises(VerificationError, match="unknown data root"):
        rx.receive_tx(bytes(bad_root))

    # rejecting-verifier injection
    rx.verify_proof = lambda proof: False
    with pytest.raises(VerificationError, match="verification failed"):
        rx.receive_tx(make_tx_proof(ws, 13, 14))


# ---------------------------- pipeline -------------------------------------

def test_pipeline_publishes_full_batch():
    p, gen, chain = make_pipeline(num_inner_rollup_txs=2,
                                  num_outer_rollup_proofs=1)
    ws = p.world_state
    p.tx_receiver.receive_tx(make_tx_proof(ws, 1, 2))
    p.tx_receiver.receive_tx(make_tx_proof(ws, 3, 4))
    assert p.db.get_pending_tx_count() == 2

    assert p.coordinator.tick()  # full batch -> immediate publish
    assert gen.calls == [0, 1]
    assert p.db.get_pending_tx_count() == 0
    assert p.db.get_last_settled_rollup().id == 0
    assert len(chain.blocks) == 1
    assert p.db.get_unsettled_tx_count() == 0
    # world state advanced (notes inserted)
    assert ws.data_tree_next_index > 0
    assert p.metrics.rollup_published.collect()[0][1] == 1


def test_pipeline_flush_partial_batch():
    p, gen, chain = make_pipeline(num_inner_rollup_txs=2,
                                  num_outer_rollup_proofs=2)
    ws = p.world_state
    # settle one rollup first so the "first ever" trigger doesn't fire
    p.tx_receiver.receive_tx(make_tx_proof(ws, 1, 2))
    assert p.coordinator.tick()
    # one pending tx, long interval -> no publish
    p.tx_receiver.receive_tx(make_tx_proof(ws, 5, 6))
    assert not p.coordinator.tick()
    p.coordinator.flush_txs()
    assert p.coordinator.tick()
    assert p.db.get_pending_tx_count() == 0


def test_pipeline_failure_recovery():
    """Injected proof failure -> reset releases txs + restores world state;
    the next tick succeeds (pipeline_coordinator.ts:84-91 replay)."""
    p, gen, chain = make_pipeline(num_inner_rollup_txs=1,
                                  num_outer_rollup_proofs=1)
    ws = p.world_state
    root0 = ws.data_root()
    p.tx_receiver.receive_tx(make_tx_proof(ws, 1, 2))

    gen.fail_next = 1
    assert not p.coordinator.tick()
    assert ws.data_root() == root0          # world state rolled back
    assert p.db.get_pending_tx_count() == 1  # tx released

    assert p.coordinator.tick()
    assert p.db.get_pending_tx_count() == 0
    assert p.db.get_last_settled_rollup() is not None


def test_publisher_rejected_by_chain():
    """LocalBlockchain rejection (on-chain verifier) -> not settled."""
    p, gen, chain = make_pipeline(num_inner_rollup_txs=1,
                                  num_outer_rollup_proofs=1)
    chain.verify_proof = lambda proof: False
    ws = p.world_state
    p.tx_receiver.receive_tx(make_tx_proof(ws, 1, 2))
    assert not p.coordinator.tick()
    assert p.db.get_last_settled_rollup() is None


def test_metrics_exposition():
    p, gen, chain = make_pipeline()
    p.tx_receiver.receive_tx(make_tx_proof(p.world_state, 1, 2))
    text = p.metrics.expose()
    assert "# TYPE tx_received_total counter" in text
    assert 'tx_received_total{type="0"} 1' in text
    assert "pending_txs 1" in text


def test_status_endpoint_shape():
    p, gen, chain = make_pipeline()
    s = p.status()
    for key in ("pendingTxCount", "nextRollupId", "dataRoot",
                "nextPublishTime"):
        assert key in s
