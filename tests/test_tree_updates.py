"""Circuit tree-update helpers vs the native world state
(ref: rollup_circuit.cpp:33-94, root_rollup_circuit.cpp:27-47)."""

from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.rollup import tree_updates as tu
from aztec_tpu.rollup.world_state import WorldState
from aztec_tpu.rollup.notes_native import compute_nullifier, encrypt_note, ValueNote
from aztec_tpu.stdlib import witness
from aztec_tpu.stdlib.field_t import BoolT, FieldT
from aztec_tpu.stdlib.pedersen_circuit import Point
from aztec_tpu.crypto import pedersen as pd

PUB = pd.fixed_base_scalar_mul_g1(0xB0B, 254)


def _cpath(ctx, path):
    return [(witness(ctx, l), witness(ctx, r)) for (l, r) in path]


def test_nullifier_chain_matches_world_state():
    ws = WorldState(null_depth=16)
    note = ValueNote(5, 0, 0, PUB, 0x5EC)
    nul1 = compute_nullifier(encrypt_note(note), 0, 0xB0B, True)
    nul2 = compute_nullifier(encrypt_note(note), 1, 0xB0B, True)

    old_root = ws.null_tree.root
    r1, p1 = ws.insert_nullifier(nul1, True)
    r2, p2 = ws.insert_nullifier(0, False)    # padding entry
    r3, p3 = ws.insert_nullifier(nul2, True)

    c = TurboComposer()
    final = tu.check_nullifiers_inserted(
        c, [r1, r2, r3], [p1, p2, p3], witness(c, old_root),
        [witness(c, nul1), witness(c, 0), witness(c, nul2)],
        [BoolT.from_witness(c, True), BoolT.from_witness(c, False),
         BoolT.from_witness(c, True)],
    )
    assert final.get_value() == ws.null_tree.root == r3
    assert not c.failed, c.err
    assert check_turbo(c) == []


def test_nullifier_chain_wrong_root_fails():
    ws = WorldState(null_depth=16)
    nul = compute_nullifier(
        encrypt_note(ValueNote(5, 0, 0, PUB, 1)), 0, 0xB0B, True)
    old_root = ws.null_tree.root
    r1, p1 = ws.insert_nullifier(nul, True)
    c = TurboComposer()
    tu.check_nullifiers_inserted(
        c, [r1 ^ 1], [p1], witness(c, old_root),
        [witness(c, nul)], [BoolT.from_witness(c, True)])
    assert c.failed or check_turbo(c) != []


def test_data_subtree_update_matches_world_state():
    ws = WorldState(data_depth=4)
    n1 = encrypt_note(ValueNote(1, 0, 0, PUB, 11))
    n2 = encrypt_note(ValueNote(2, 0, 0, PUB, 12))
    # pre-existing notes at 0,1; subtree of size 2 appended at index 4
    ws.insert_note(0, n1)
    ws.insert_note(1, n2)
    old_root = ws.data_root()
    start = 4
    old_path = ws.data_tree.get_hash_path(start)
    a1 = encrypt_note(ValueNote(3, 0, 0, PUB, 13))
    a2 = encrypt_note(ValueNote(4, 0, 0, PUB, 14))
    ws.insert_note(start, a1)
    ws.insert_note(start + 1, a2)
    new_root = ws.data_root()

    c = TurboComposer()
    vals = [Point(witness(c, a1[0]), witness(c, a1[1])),
            Point(witness(c, a2[0]), witness(c, a2[1]))]
    tu.check_data_tree_updated(
        c, 1, _cpath(c, old_path), _cpath(c, old_path), vals,
        witness(c, old_root), witness(c, new_root), witness(c, start), 4)
    assert not c.failed, c.err
    assert check_turbo(c) == []


def test_root_tree_update_matches_world_state():
    ws = WorldState(root_depth=4)
    data_root = 0x1234321
    old_root = ws.root_tree.root
    old_path = ws.root_tree.get_hash_path(1)
    new_root, _ = ws.insert_data_root(0, data_root)

    c = TurboComposer()
    tu.check_root_tree_updated(
        c, _cpath(c, old_path), witness(c, 0), witness(c, data_root),
        witness(c, new_root), witness(c, old_root), 4)
    assert not c.failed, c.err
    assert check_turbo(c) == []
