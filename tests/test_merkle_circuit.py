"""In-circuit Merkle membership (ref: stdlib/merkle_tree/membership.test.cpp).

NOTE: zero-valued nodes hash differently in-circuit (the circuit pedersen
does not special-case input 0 — same as the reference, see
stdlib/hash/pedersen/pedersen.cpp:26-28 'edge cases'), so the tree is
filled with nonzero leaves.
"""

from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.stdlib import witness, constant, BoolT
from aztec_tpu.stdlib.merkle_circuit import (
    compute_root_from_path,
    assert_check_membership,
)
from aztec_tpu.merkle import MemoryTree
from aztec_tpu.merkle.memory_tree import hash_value_native


def _tree():
    t = MemoryTree(3)
    for i in range(8):
        t.update_element(i, (1000 + i).to_bytes(64, "big"))
    return t


def test_membership_circuit():
    t = _tree()
    v = (123).to_bytes(64, "big")
    t.update_element(5, v)
    leaf_hash = hash_value_native(v)
    path = t.get_hash_path(5)

    c = TurboComposer()
    leaf = witness(c, leaf_hash)
    bits = [BoolT.from_witness(c, bool((5 >> i) & 1)) for i in range(3)]
    cpath = [(witness(c, l), witness(c, r)) for (l, r) in path]
    root = compute_root_from_path(leaf, bits, cpath)
    assert root.get_value() == t.root
    assert_check_membership(constant(t.root), leaf, bits, cpath)
    assert not c.failed, c.err
    assert check_turbo(c) == []


def test_wrong_leaf_fails_value_check():
    t = _tree()
    path = t.get_hash_path(2)
    c = TurboComposer()
    leaf = witness(c, 0xBAD)
    bits = [BoolT.from_witness(c, bool((2 >> i) & 1)) for i in range(3)]
    cpath = [(witness(c, l), witness(c, r)) for (l, r) in path]
    root = compute_root_from_path(leaf, bits, cpath)
    assert root.get_value() != t.root
