"""StumpTree tests (ref: stdlib/merkle_tree/merkle_tree.test.cpp) —
equivalence with the plain sparse tree, stump path restoration, historic
root snapshots, depth-256 (production nullifier tree) behavior, and the
sqlite persistence layer.
"""

import random

from aztec_tpu.crypto.pedersen import compress_native
from aztec_tpu.merkle.memory_tree import hash_value_native
from aztec_tpu.merkle.sparse_tree import MemoryStore, SparseTree
from aztec_tpu.merkle.stump_tree import SqliteStore, StumpTree

rng = random.Random(7)


def leaf(i: int) -> bytes:
    return i.to_bytes(64, "big")


def verify_path(tree, index: int, value: bytes) -> bool:
    """Recompute the root from the hash path (membership check)."""
    cur = hash_value_native(value)
    for lvl, (left, right) in enumerate(tree.get_hash_path(index)):
        if (index >> lvl) & 1:
            if right != cur:
                return False
        elif left != cur:
            return False
        cur = compress_native(left, right)
    return cur == tree.root


def test_matches_sparse_tree_random():
    depth = 6
    st = StumpTree(MemoryStore(), depth)
    sp = SparseTree(MemoryStore(), depth)
    assert st.root == sp.root  # empty roots agree
    indices = rng.sample(range(1 << depth), 20)
    for k, i in enumerate(indices):
        v = leaf(1000 + k)
        r1 = st.update_element(i, v)
        r2 = sp.update_element(i, v)
        assert r1 == r2, (k, i)
        assert st.get_element(i) == v
    # paths agree everywhere (occupied or not)
    for i in range(1 << depth):
        assert st.get_hash_path(i) == sp.get_hash_path(i), i


def test_update_same_element():
    st = StumpTree(MemoryStore(), 5)
    sp = SparseTree(MemoryStore(), 5)
    for v in (leaf(1), leaf(2), leaf(3)):
        r1 = st.update_element(9, v)
        r2 = sp.update_element(9, v)
    assert r1 == r2
    assert verify_path(st, 9, leaf(3))


def test_depth_256_nullifier_tree():
    """Exact-index nullifier insertion at production depth: stumps keep
    each update O(path-to-nearest-element), not O(2^256)."""
    st = StumpTree(MemoryStore(), 256)
    nullifiers = [rng.getrandbits(254) for _ in range(6)]
    for n in nullifiers:
        st.update_element(n, (1).to_bytes(64, "big"))
    for n in nullifiers:
        assert verify_path(st, n, (1).to_bytes(64, "big"))
    # a non-inserted index proves empty (path to zero leaf)
    absent = rng.getrandbits(254)
    assert verify_path(st, absent, bytes(64))


def test_historic_roots_remain_readable():
    """Content-addressed nodes are never overwritten: old roots still
    resolve (the world-state snapshot property)."""
    store = MemoryStore()
    st = StumpTree(store, 6)
    st.update_element(3, leaf(1))
    old_root = st.root
    old_path = st.get_hash_path(3)
    st.update_element(40, leaf(2))
    assert st.root != old_root
    # rebuild a view at the old root: raw node data still present
    raw = store.get(old_root.to_bytes(32, "big"))
    assert raw is not None


def test_sqlite_store_persistence(tmp_path):
    p = str(tmp_path / "tree.db")
    st = StumpTree(SqliteStore(p), 8, b"\x01")
    r = None
    for i in (1, 7, 200):
        r = st.update_element(i, leaf(i))
    st.store.commit()
    # reopen
    st2 = StumpTree(SqliteStore(p), 8, b"\x01")
    assert st2.root == r
    assert st2.get_element(7) == leaf(7)
    assert verify_path(st2, 200, leaf(200))
