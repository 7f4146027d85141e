"""byte_array: in-circuit byte decomposition of field elements
(ref: stdlib/primitives/byte_array/byte_array.cpp).

Decomposes a FieldT into big-endian bytes with 8-bit range constraints and
an exact recomposition constraint — the bridge between field elements and
the uint32/blake2s layer in the recursive transcript.
"""

from __future__ import annotations

from typing import List

from ..ff.bn254 import FR_MOD
from .field_t import FieldT
from .uint32 import UInt32

M = FR_MOD


def field_to_bytes(inp: FieldT, num_bytes: int = 32) -> List[FieldT]:
    """Witness big-endian bytes of a (normalized) field element and
    constrain their recomposition to equal it."""
    if inp.is_constant():
        v = inp.get_value()
        return [
            FieldT.constant((v >> (8 * (num_bytes - 1 - i))) & 0xFF)
            for i in range(num_bytes)
        ]
    ctx = inp.ctx
    a = inp.normalize()
    v = a.get_value()
    assert v < (1 << (8 * num_bytes))
    byte_vals = [(v >> (8 * (num_bytes - 1 - i))) & 0xFF for i in range(num_bytes)]
    out = []
    acc = FieldT.constant(0)
    for bv in byte_vals:
        b = FieldT.from_witness(ctx, bv)
        ctx.create_range_constraint(b.witness_index, 8)
        out.append(b)
        acc = acc * 256 + b
    acc.assert_equal(a, "byte_array recomposition")
    return out


def bytes_to_uint32_words_le(byte_fields: List[FieldT],
                             ctx=None) -> List[UInt32]:
    """Pack in-circuit bytes (big-endian list) into little-endian uint32
    words as blake2s consumes them (4 bytes per word, LE within word)."""
    assert len(byte_fields) % 4 == 0
    if ctx is None:
        ctx = next(b.ctx for b in byte_fields if b.ctx is not None)
    words = []
    for i in range(0, len(byte_fields), 4):
        w = (
            byte_fields[i]
            + byte_fields[i + 1] * (1 << 8)
            + byte_fields[i + 2] * (1 << 16)
            + byte_fields[i + 3] * (1 << 24)
        )
        # bytes are LE within the word (byte i is the LOW byte); the word is
        # < 2^32 by construction of its 8-bit-constrained bytes
        if w.is_constant():
            words.append(UInt32.from_constant(ctx, w.get_value()))
        else:
            words.append(UInt32(ctx, w.normalize().witness_index))
    return words
