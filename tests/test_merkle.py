"""Merkle tree tests (ref: stdlib/merkle_tree/memory_tree.test.cpp,
merkle_tree.test.cpp)."""

from aztec_tpu.merkle import MemoryTree, SparseTree, MemoryStore
from aztec_tpu.merkle.memory_tree import hash_value_native
from aztec_tpu.merkle.sparse_tree import check_hash_path


def test_memory_tree_roundtrip():
    t = MemoryTree(3)
    root0 = t.root
    v = (123).to_bytes(64, "big")
    r1 = t.update_element(5, v)
    assert r1 != root0
    assert t.get_element(5) == v
    path = t.get_hash_path(5)
    assert len(path) == 3
    assert check_hash_path(t.root, 5, path, hash_value_native(v))


def test_sparse_matches_dense():
    dense = MemoryTree(4)
    sparse = SparseTree(MemoryStore(), 4)
    assert dense.root == sparse.root  # empty roots agree
    for idx, val in ((0, b"\x01" * 64), (7, b"\x02" * 64), (15, b"\x03" * 64)):
        dense.update_element(idx, val)
        sparse.update_element(idx, val)
        assert dense.root == sparse.root
    assert dense.get_hash_path(7) == sparse.get_hash_path(7)


def test_sparse_deep_tree_cheap():
    t = SparseTree(MemoryStore(), 128)
    r = t.update_element(2**100, b"\x05" * 64)
    assert r == t.root
    path = t.get_hash_path(2**100)
    assert check_hash_path(t.root, 2**100, path, hash_value_native(b"\x05" * 64))
