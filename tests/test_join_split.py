"""join_split circuit tests (ref: rollup/proofs/join_split/join_split.test.cpp).

Default tier: witness generation + host circuit-satisfiability check.
AZTEC_HEAVY=1 additionally proves/verifies with unrolled turbo settings.
"""

import os

import pytest

from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.merkle import MemoryTree
from aztec_tpu.rollup import notes_native as nn
from aztec_tpu.rollup.join_split import (
    JoinSplitTx,
    join_split_circuit,
    sign_tx,
)
from aztec_tpu.crypto import pedersen as pd

DEPTH = 3

ACCOUNT_PRIV = 0x0B0B + 7
ACCOUNT_PUB = pd.fixed_base_scalar_mul_g1(ACCOUNT_PRIV, 254)


def make_tx():
    in1 = nn.ValueNote(100, 1, 0, ACCOUNT_PUB, 0xAAAA1)
    in2 = nn.ValueNote(50, 1, 0, ACCOUNT_PUB, 0xAAAA2)
    out1 = nn.ValueNote(70, 1, 0, ACCOUNT_PUB, 0xBBBB1)
    out2 = nn.ValueNote(40, 1, 0, ACCOUNT_PUB, 0xBBBB2)

    tree = MemoryTree(DEPTH)
    tree.update_element(0, nn.leaf_bytes(nn.encrypt_note(in1)))
    tree.update_element(1, nn.leaf_bytes(nn.encrypt_note(in2)))

    tx = JoinSplitTx(
        public_input=0,
        public_output=30,
        asset_id=1,
        num_input_notes=2,
        input_index=(0, 1),
        input_note=(in1, in2),
        output_note=(out1, out2),
        signing_pub_key=ACCOUNT_PUB,   # nonce == 0: spend with account key
        signature=(bytes(32), bytes(32)),
        old_data_root=tree.root,
        input_path=(tree.get_hash_path(0), tree.get_hash_path(1)),
        account_index=2,
        account_path=tree.get_hash_path(2),
        input_owner=0xAA,
        output_owner=0xBB,
        account_private_key=ACCOUNT_PRIV,
        alias_hash=0,
        nonce=0,
    )
    tx.signature = sign_tx(tx, ACCOUNT_PRIV, k=0x1234567)
    return tx


def test_join_split_valid():
    tx = make_tx()
    c = TurboComposer()
    outputs = join_split_circuit(c, tx)
    assert not c.failed, c.err
    assert check_turbo(c) == []
    assert outputs.tx_fee.get_value() == 10
    # the 14 InnerProofFields public inputs
    assert len(c.public_inputs) == 14


def test_join_split_bad_signature_fails():
    tx = make_tx()
    s, e = tx.signature
    tx.signature = (s, bytes([e[0] ^ 1]) + e[1:])
    c = TurboComposer()
    join_split_circuit(c, tx)
    assert c.failed or check_turbo(c) != []


def test_join_split_wrong_root_fails():
    tx = make_tx()
    tx.old_data_root = (tx.old_data_root + 1) % (1 << 254)
    c = TurboComposer()
    join_split_circuit(c, tx)
    assert c.failed or check_turbo(c) != []


def test_join_split_unbalanced_fails():
    tx = make_tx()
    tx.output_note[0].value += 1 << 200  # fee underflows its range
    tx.signature = sign_tx(tx, ACCOUNT_PRIV, k=0x1234567)
    c = TurboComposer()
    join_split_circuit(c, tx)
    assert c.failed or check_turbo(c) != []


@pytest.mark.skipif(os.environ.get("AZTEC_HEAVY") != "1",
                    reason="set AZTEC_HEAVY=1 for prove+verify")
def test_join_split_prove_verify_unrolled():
    from aztec_tpu.srs.reference_string import FakeReferenceStringFactory

    tx = make_tx()
    c = TurboComposer(crs_factory=FakeReferenceStringFactory())
    join_split_circuit(c, tx)
    assert not c.failed and check_turbo(c) == []
    prover = c.create_unrolled_prover()
    proof = prover.construct_proof()
    verifier = c.create_unrolled_verifier()
    assert verifier.verify_proof(proof)
