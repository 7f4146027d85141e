"""escape_hatch circuit test (ref: escape_hatch/escape_hatch.test.cpp)."""

from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.rollup import notes_native as nn
from aztec_tpu.rollup.world_state import WorldState
from aztec_tpu.rollup.join_split import JoinSplitTx, sign_tx
from aztec_tpu.rollup.escape_hatch import EscapeHatchTx, escape_hatch_circuit
from aztec_tpu.rollup.inner_proof_data import InnerProofFields
from aztec_tpu.crypto import pedersen as pd

ACCOUNT_PRIV = 0x0B0B + 7
ACCOUNT_PUB = pd.fixed_base_scalar_mul_g1(ACCOUNT_PRIV, 254)


def make_escape_tx():
    ws = WorldState(data_depth=3, null_depth=16, root_depth=3)

    in1 = nn.ValueNote(100, 1, 0, ACCOUNT_PUB, 0xAAAA1)
    in2 = nn.ValueNote(50, 1, 0, ACCOUNT_PUB, 0xAAAA2)
    # escape hatch forces tx_fee == 0 and all value stays in notes
    out1 = nn.ValueNote(90, 1, 0, ACCOUNT_PUB, 0xBBBB1)
    out2 = nn.ValueNote(60, 1, 0, ACCOUNT_PUB, 0xBBBB2)

    enc_in = [nn.encrypt_note(in1), nn.encrypt_note(in2)]
    ws.insert_note(0, enc_in[0])
    ws.insert_note(1, enc_in[1])
    old_data_root = ws.data_root()

    js = JoinSplitTx(
        public_input=0, public_output=0, asset_id=1, num_input_notes=2,
        input_index=(0, 1), input_note=(in1, in2),
        output_note=(out1, out2),
        signing_pub_key=ACCOUNT_PUB, signature=(bytes(32), bytes(32)),
        old_data_root=old_data_root,
        input_path=(ws.data_tree.get_hash_path(0),
                    ws.data_tree.get_hash_path(1)),
        account_index=2, account_path=ws.data_tree.get_hash_path(2),
        input_owner=0xAA, output_owner=0xBB,
        account_private_key=ACCOUNT_PRIV, alias_hash=0, nonce=0,
    )
    js.signature = sign_tx(js, ACCOUNT_PRIV, k=0x777)

    # nullifier insertions
    nul1 = nn.compute_nullifier(enc_in[0], 0, ACCOUNT_PRIV, True)
    nul2 = nn.compute_nullifier(enc_in[1], 1, ACCOUNT_PRIV, True)
    old_null_root = ws.null_tree.root
    root1, path1 = ws.insert_nullifier(nul1)
    root2, path2 = ws.insert_nullifier(nul2)

    # data tree subtree append at index 2 (height 1 -> 2 leaves)
    data_start_index = 2
    old_data_path = ws.data_tree.get_hash_path(data_start_index)
    ws.insert_note(2, nn.encrypt_note(out1))
    ws.insert_note(3, nn.encrypt_note(out2))
    new_data_root = ws.data_root()

    # root tree insertion for rollup_id 0
    old_roots_root = ws.root_tree.root
    old_roots_path = ws.root_tree.get_hash_path(1)
    new_roots_root, _ = ws.insert_data_root(0, new_data_root)

    return EscapeHatchTx(
        js_tx=js,
        rollup_id=0,
        data_start_index=data_start_index,
        new_data_root=new_data_root,
        old_data_path=old_data_path,
        new_null_roots=(root1, root2),
        old_null_paths=(path1, path2),
        old_null_root=old_null_root,
        old_data_roots_root=old_roots_root,
        new_data_roots_root=new_roots_root,
        old_data_roots_path=old_roots_path,
    )


def test_escape_hatch_valid():
    tx = make_escape_tx()
    c = TurboComposer()
    escape_hatch_circuit(c, tx)
    assert not c.failed, c.err
    assert check_turbo(c) == []
    # rollup-shaped public inputs: 9 + NUM_ASSETS + 1 + 12
    assert len(c.public_inputs) == 9 + 4 + 1 + 12


def test_escape_hatch_nonzero_fee_fails():
    tx = make_escape_tx()
    tx.js_tx.output_note[1].value -= 1  # creates a fee of 1
    tx.js_tx.signature = sign_tx(tx.js_tx, ACCOUNT_PRIV, k=0x777)
    c = TurboComposer()
    escape_hatch_circuit(c, tx)
    assert c.failed or check_turbo(c) != []


def test_escape_hatch_wrong_null_root_fails():
    tx = make_escape_tx()
    tx.new_null_roots = (tx.new_null_roots[0],
                         (tx.new_null_roots[1] ^ 1))
    c = TurboComposer()
    escape_hatch_circuit(c, tx)
    assert c.failed or check_turbo(c) != []
