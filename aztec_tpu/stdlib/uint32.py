"""uint32 in-circuit type — the width-32 instance of stdlib.uint.UIntBase
(ref: stdlib/primitives/uint/uint.cpp; see uint.py for the gate design)."""

from __future__ import annotations

from .uint import UIntBase

MASK32 = (1 << 32) - 1


class UInt32(UIntBase):
    WIDTH = 32
