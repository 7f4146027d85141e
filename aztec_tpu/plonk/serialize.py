"""Proof/transcript element serialization (byte-compatible with the reference).

- fr: canonical value, 32 bytes big-endian (ref: ecc/fields/field.hpp:189
  serialize_to_buffer -> common/serialize.hpp big-endian write).
- g1 affine: **y first, then x**, each 32 bytes big-endian; point at infinity
  sets bit 7 of byte 0 (ref: ecc/groups/affine_element.hpp:38-56).
- uint32: 4 bytes big-endian (circuit_size / public_input_size preamble).
"""

from __future__ import annotations

from ..ff.bn254 import FR_MOD


def fr_to_bytes(v: int) -> bytes:
    return (v % FR_MOD).to_bytes(32, "big")


def fr_from_bytes(b: bytes) -> int:
    return int.from_bytes(b, "big") % FR_MOD


def g1_to_bytes(pt) -> bytes:
    """pt: (x, y) canonical ints or None for infinity."""
    if pt is None:
        out = bytearray(64)
        out[0] |= 0x80
        return bytes(out)
    x, y = pt
    return y.to_bytes(32, "big") + x.to_bytes(32, "big")


def g1_from_bytes(b: bytes):
    if (b[0] >> 7) & 1:
        return None
    y = int.from_bytes(b[0:32], "big")
    x = int.from_bytes(b[32:64], "big")
    # reject non-canonical encodings (coordinate >= p): otherwise y and
    # y + p are two valid byte strings for the same point (ADVICE r1)
    from ..ff.bn254 import FQ_MOD

    if x >= FQ_MOD or y >= FQ_MOD:
        return None
    return (x, y)


def u32_to_bytes(v: int) -> bytes:
    return int(v).to_bytes(4, "big")
