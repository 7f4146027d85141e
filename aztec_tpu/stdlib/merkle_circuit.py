"""In-circuit Merkle membership (ref: stdlib/merkle_tree/membership.hpp).

check_membership hashes a leaf up a Pedersen path, selecting child order by
the index bits; assert_check_membership pins the result to the root.
update_membership proves old-leaf membership and new-root correctness with
the same path (the world-state update constraint).
"""

from __future__ import annotations

from typing import List, Tuple

from .field_t import FieldT, BoolT
from .pedersen_circuit import compress


def _select(bit: BoolT, a: FieldT, b: FieldT) -> Tuple[FieldT, FieldT]:
    """(a, b) if bit == 0 else (b, a) — two conditional swaps."""
    f = bit.to_field()
    left = a + f * (b - a)
    right = b + f * (a - b)
    return left, right


def compute_root_from_path(leaf: FieldT, index_bits: List[BoolT],
                           path: List[Tuple[FieldT, FieldT]]) -> FieldT:
    """path[i] = (left_sibling, right_sibling) values at level i."""
    current = leaf
    for bit, (l_sib, r_sib) in zip(index_bits, path):
        # when bit = 0 the current node is the left child: hash(cur, r_sib);
        # when bit = 1 it is the right child: hash(l_sib, cur)
        left, _ = _select(bit, current, l_sib)
        right, _ = _select(bit, r_sib, current)
        current = compress(left, right)
    return current


def check_membership(root: FieldT, leaf: FieldT, index_bits: List[BoolT],
                     path: List[Tuple[FieldT, FieldT]]) -> bool:
    got = compute_root_from_path(leaf, index_bits, path)
    return got.get_value() == root.get_value()


def assert_check_membership(root: FieldT, leaf: FieldT,
                            index_bits: List[BoolT],
                            path: List[Tuple[FieldT, FieldT]]):
    got = compute_root_from_path(leaf, index_bits, path)
    got.assert_equal(root, "merkle membership")


def update_membership(new_root: FieldT, new_leaf: FieldT,
                      old_root: FieldT, old_leaf: FieldT,
                      index_bits: List[BoolT],
                      path_old: List[Tuple[FieldT, FieldT]],
                      path_new: List[Tuple[FieldT, FieldT]]):
    """ref: membership.hpp update_membership — same index, both paths."""
    assert_check_membership(old_root, old_leaf, index_bits, path_old)
    assert_check_membership(new_root, new_leaf, index_bits, path_new)
