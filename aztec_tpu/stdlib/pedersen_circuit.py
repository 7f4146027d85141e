"""In-circuit Pedersen hash over the Turbo fixed-base ECC gates
(ref: stdlib/hash/pedersen/pedersen.cpp:38-196).

hash_single(in) decomposes the (witnessed) input into 127 2-bit WNAF quads
and walks the precomputed generator ladder with one
create_fixed_group_add_gate per quad.  Each gate simultaneously constrains
the running accumulator d (reconstructing the scalar) and the ECC ladder
point (a, b); the final big-add row exposes the result and ties the
reconstructed scalar back to the input witness.
"""

from __future__ import annotations

from typing import Tuple

from ..crypto import pedersen as pd
from ..ff.bn254 import FR_MOD
from .field_t import FieldT

M = FR_MOD
NUM_QUADS = 127


def hash_single(inp: FieldT, hash_index: int) -> Tuple[FieldT, FieldT]:
    ctx = inp.ctx
    if inp.is_constant():
        x, y = pd.hash_single(inp.get_value(), hash_index)
        return FieldT.constant(x), FieldT.constant(y)
    scalar = inp.normalize()
    value = scalar.get_value()

    ladder = pd._hash_ladder(hash_index)[pd.QUAD_LENGTH - NUM_QUADS - 1 :]
    selectors = pd.ladder_selectors(hash_index, hash_variant=True)[
        pd.QUAD_LENGTH - NUM_QUADS - 1 :
    ]
    generator = pd.get_generator(hash_index * 2 + 1)

    origin_0 = ladder[0][0]
    origin_1 = pd.g_add(origin_0, generator)

    base = value if (value & 1) else (value - 2) % M
    wnaf, skew = pd.fixed_wnaf(base, 2 * NUM_QUADS + 1, 2)

    accumulator_offset = pow(pow(2, 254, M), -1, M)
    origin_acc = (1, (accumulator_offset + 1) % M)

    mult_transcript = [origin_1 if skew else origin_0]
    acc_transcript = [origin_acc[1] if skew else origin_acc[0]]
    for i in range(NUM_QUADS):
        entry = wnaf[i + 1]
        digit3 = (entry & 0xFFFFFF) == 1
        neg = (entry >> 31) & 1
        scalar_add = 3 if digit3 else 1
        pt = ladder[i + 1][1] if digit3 else ladder[i + 1][0]
        if neg:
            scalar_add = -scalar_add
            pt = pd.g_neg(pt)
        acc_transcript.append((4 * acc_transcript[i] + scalar_add) % M)
        mult_transcript.append(pd.g_add(mult_transcript[i], pt))

    init = (
        origin_0[0],
        (origin_0[0] - origin_1[0]) % M,
        origin_0[1],
        (origin_0[1] - origin_1[1]) % M,
    )

    x_alpha = accumulator_offset
    for i in range(NUM_QUADS):
        d = ctx.add_variable(acc_transcript[i])
        a = ctx.add_variable(mult_transcript[i][0])
        b = ctx.add_variable(mult_transcript[i][1])
        if i == 0:
            c = ctx.put_constant_variable(x_alpha)
        else:
            c = ctx.add_variable(x_alpha)
        x_alpha = (
            ladder[i + 1][1][0]
            if (wnaf[i + 1] & 0xFFFFFF) == 1
            else ladder[i + 1][0][0]
        )
        q = selectors[i + 1]
        if i == 0:
            ctx.create_fixed_group_add_gate_with_init(
                a, b, c, d, q[0], q[1], q[2], q[3], *init
            )
        else:
            ctx.create_fixed_group_add_gate(a, b, c, d, q[0], q[1], q[2], q[3])

    out_x = ctx.add_variable(mult_transcript[NUM_QUADS][0])
    out_y = ctx.add_variable(mult_transcript[NUM_QUADS][1])
    out_alpha = ctx.add_variable(x_alpha)
    out_acc = ctx.add_variable(acc_transcript[NUM_QUADS])
    ctx.create_big_add_gate(out_x, out_y, out_alpha, out_acc, 0, 0, 0, 0, 0)
    ctx.assert_equal(out_acc, scalar.witness_index,
                     "pedersen scalar reconstruction")
    return FieldT(ctx, out_x, 0, 1), FieldT(ctx, out_y, 0, 1)


def compress(left: FieldT, right: FieldT, hash_index: int = 0) -> FieldT:
    """ref: stdlib pedersen compress — add the two hash points with the
    incomplete-addition formula (witnessed inversion)."""
    ctx = left.ctx or right.ctx
    x1, y1 = hash_single(left, hash_index)
    x2, y2 = hash_single(right, hash_index + 1)
    lam = (y2 - y1) / (x2 - x1)
    x3 = lam * lam - x2 - x1
    y3 = lam * (x1 - x3) - y1
    _ = y3  # the compressed output is the x coordinate
    return x3.normalize()
