"""uint32 in-circuit type over the TurboComposer
(ref: stdlib/primitives/uint/ — reshaped around the turbo range/logic
accumulator gates rather than the reference's lazy-accumulator class).

Every UInt32 wraps a range-constrained witness.  Arithmetic is mod 2^32:
addition materializes the 34-bit sum and splits off the carry with range
constraints; AND/XOR ride the turbo logic constraint
(turbo_composer.cpp:480-654); rotations/shifts split the word at the pivot
bit with two range constraints and recombine linearly.
"""

from __future__ import annotations

import dataclasses

from ..ff.bn254 import FR_MOD
from ..plonk.composer import AddTriple, TurboComposer

M = FR_MOD
MASK32 = (1 << 32) - 1


@dataclasses.dataclass
class UInt32:
    ctx: TurboComposer
    witness_index: int  # range-constrained to 32 bits

    @staticmethod
    def from_witness(ctx: TurboComposer, value: int) -> "UInt32":
        idx = ctx.add_variable(value & MASK32)
        ctx.create_range_constraint(idx, 32)
        return UInt32(ctx, idx)

    @staticmethod
    def from_constant(ctx: TurboComposer, value: int) -> "UInt32":
        return UInt32(ctx, ctx.put_constant_variable(value & MASK32))

    def get_value(self) -> int:
        return self.ctx.get_variable(self.witness_index) & MASK32

    # -- arithmetic -------------------------------------------------------------
    def __add__(self, other: "UInt32") -> "UInt32":
        ctx = self.ctx
        a = self.ctx.get_variable(self.witness_index)
        b = ctx.get_variable(other.witness_index)
        total = a + b
        r = total & MASK32
        carry = total >> 32
        r_idx = ctx.add_variable(r)
        carry_idx = ctx.add_variable(carry)
        ctx.create_bool_gate(carry_idx)
        ctx.create_range_constraint(r_idx, 32)
        # a + b - r - 2^32 * carry == 0
        ctx.create_big_add_gate(
            self.witness_index, other.witness_index, r_idx, carry_idx,
            1, 1, (-1) % M, (-(1 << 32)) % M, 0,
        )
        return UInt32(ctx, r_idx)

    def __sub__(self, other: "UInt32") -> "UInt32":
        ctx = self.ctx
        a = self.get_value()
        b = other.get_value()
        r = (a - b) & MASK32
        borrow = 1 if a < b else 0
        r_idx = ctx.add_variable(r)
        borrow_idx = ctx.add_variable(borrow)
        ctx.create_bool_gate(borrow_idx)
        ctx.create_range_constraint(r_idx, 32)
        # a - b - r + 2^32 * borrow == 0
        ctx.create_big_add_gate(
            self.witness_index, other.witness_index, r_idx, borrow_idx,
            1, (-1) % M, (-1) % M, (1 << 32) % M, 0,
        )
        return UInt32(ctx, r_idx)

    # -- bitwise ------------------------------------------------------------------
    def __and__(self, other: "UInt32") -> "UInt32":
        acc = self.ctx.create_and_constraint(
            self.witness_index, other.witness_index, 32
        )
        return UInt32(self.ctx, acc["out"][-1])

    def __xor__(self, other: "UInt32") -> "UInt32":
        acc = self.ctx.create_xor_constraint(
            self.witness_index, other.witness_index, 32
        )
        return UInt32(self.ctx, acc["out"][-1])

    def __or__(self, other: "UInt32") -> "UInt32":
        # a | b = (a ^ b) + (a & b)
        return (self ^ other) + (self & other)

    def __invert__(self) -> "UInt32":
        ones = UInt32.from_constant(self.ctx, MASK32)
        return ones ^ self

    # -- rotations / shifts ---------------------------------------------------------
    def _split(self, k: int):
        """a = hi * 2^k + lo with lo < 2^k, hi < 2^{32-k} (two range gates)."""
        ctx = self.ctx
        a = self.get_value()
        lo, hi = a & ((1 << k) - 1), a >> k
        lo_idx = ctx.add_variable(lo)
        hi_idx = ctx.add_variable(hi)
        ctx.create_range_constraint(lo_idx, k)
        ctx.create_range_constraint(hi_idx, 32 - k)
        ctx.create_add_gate(
            AddTriple(hi_idx, lo_idx, self.witness_index,
                      (1 << k) % M, 1, (-1) % M, 0)
        )
        return lo_idx, hi_idx

    def ror(self, k: int) -> "UInt32":
        """rotate right: hi + lo * 2^{32-k}."""
        k %= 32
        if k == 0:
            return self
        ctx = self.ctx
        lo_idx, hi_idx = self._split(k)
        out_val = ((self.get_value() >> k) | (self.get_value() << (32 - k))) & MASK32
        out_idx = ctx.add_variable(out_val)
        ctx.create_add_gate(
            AddTriple(hi_idx, lo_idx, out_idx, 1, (1 << (32 - k)) % M,
                      (-1) % M, 0)
        )
        return UInt32(ctx, out_idx)

    def rol(self, k: int) -> "UInt32":
        return self.ror((32 - k) % 32)

    def __rshift__(self, k: int) -> "UInt32":
        k %= 32
        if k == 0:
            return self
        _, hi_idx = self._split(k)
        return UInt32(self.ctx, hi_idx)

    def __lshift__(self, k: int) -> "UInt32":
        k %= 32
        if k == 0:
            return self
        ctx = self.ctx
        lo_idx, _ = self._split(32 - k)
        out_val = (self.get_value() << k) & MASK32
        out_idx = ctx.add_variable(out_val)
        ctx.create_add_gate(
            AddTriple(lo_idx, ctx.zero_idx, out_idx, (1 << k) % M, 0,
                      (-1) % M, 0)
        )
        return UInt32(ctx, out_idx)
