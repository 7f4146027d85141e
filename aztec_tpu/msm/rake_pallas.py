"""Fully-fused Pallas rake-scan kernel for the Pippenger MSM.

The rake segment scan is the MSM's dominant phase: K sequential steps of a
width-B batched state machine (compare digit, mixed-add or restart run).
Composing it from per-step XLA ops costs ~6x its compute bound in loop
glue — the accumulator round-trips HBM every step and the per-step select/
stack traffic is pure overhead (round-3 chained measurements:
147 ms/round composed vs a 23 ms pure-add chain at 2^21).

This kernel runs the WHOLE scan in one pallas_call:

- grid (B/1024, K), K innermost: each lane-chunk streams its K steps
  sequentially while the accumulator (X, Y, Z planes + previous digit)
  lives in VMEM scratch the entire time;
- each step is the fused mixed-add formula from curves/group_pallas.py
  plus the same-digit select, on (8, 128) limb tiles;
- per-step scan values stream straight to the output blocks.

Data layout: K-major. Points arrive as (K*16, B/128, 128) planes (row
k*16+i = limb i of step k), digits as (K, B/128, 128); outputs match.
Bit-identical to the lax.scan composition (same formulas, same select
semantics).

Reference analog: the add-chain evaluation loop of
scalar_multiplication.cpp:560-700, re-designed as a vector state machine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.pallas_field import KF, L
from ..ff.spec import FieldSpec
from ..curves.group_pallas import _f_mixed_add_unsafe

BC = 1024          # lanes per grid block
ROWS = BC // 128   # sublane rows per (8, 128) tile


def _supported(B: int) -> bool:
    return B >= BC and B % BC == 0


@functools.lru_cache(maxsize=None)
def _rake_call(spec: FieldSpec, B: int, K: int):
    import os

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = os.environ.get("AZTEC_PALLAS") == "interpret"
    kf = KF(spec)
    sentinel = np.uint32(0x1FFFF)

    def kernel(dig_ref, px_ref, py_ref, ox_ref, oy_ref, oz_ref,
               accX, accY, accZ, accd):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            accd[:] = jnp.full((ROWS, 128), sentinel, jnp.uint32)
            z = jnp.zeros((ROWS, 128), jnp.uint32)
            for i in range(L):
                accX[i] = z
                accY[i] = z
                accZ[i] = z

        dk = dig_ref[0]
        X1 = [accX[i] for i in range(L)]
        Y1 = [accY[i] for i in range(L)]
        Z1 = [accZ[i] for i in range(L)]
        X2 = [px_ref[i] for i in range(L)]
        Y2 = [py_ref[i] for i in range(L)]

        aX, aY, aZ = _f_mixed_add_unsafe(kf, [X1, Y1, Z1, X2, Y2])
        one = kf.one_mont_elem(X2)
        same = dk == accd[:]
        nX = kf.select(same, aX, X2)
        nY = kf.select(same, aY, Y2)
        nZ = kf.select(same, aZ, one)
        for i in range(L):
            ox_ref[i] = nX[i]
            oy_ref[i] = nY[i]
            oz_ref[i] = nZ[i]
            accX[i] = nX[i]
            accY[i] = nY[i]
            accZ[i] = nZ[i]
        accd[:] = dk

    Bg = B // 128
    # index maps return BLOCK indices (the compiler scales by block_shape):
    # pt block (L, ROWS, 128) at block (k, b) covers rows [k*L, (k+1)*L).
    dig_spec = pl.BlockSpec((1, ROWS, 128), lambda b, k: (k, b, 0),
                            memory_space=pltpu.VMEM)
    pt_spec = pl.BlockSpec((L, ROWS, 128), lambda b, k: (k, b, 0),
                           memory_space=pltpu.VMEM)

    @jax.jit
    def call(dig, px, py):
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((K * L, Bg, 128), jnp.uint32)
                for _ in range(3)
            ),
            grid=(Bg // ROWS, K),
            in_specs=[dig_spec, pt_spec, pt_spec],
            out_specs=(pt_spec, pt_spec, pt_spec),
            scratch_shapes=[
                pltpu.VMEM((L, ROWS, 128), jnp.uint32),
                pltpu.VMEM((L, ROWS, 128), jnp.uint32),
                pltpu.VMEM((L, ROWS, 128), jnp.uint32),
                pltpu.VMEM((ROWS, 128), jnp.uint32),
            ],
            interpret=interpret,
        )(dig, px, py)
        return outs

    return call


def _unroll_for(K: int) -> int:
    """K-steps per grid invocation: amortizes per-invocation pipeline
    overhead (measured round 3: 2048 invocations x ~27 us wall vs ~9 us
    of arithmetic at B=2^15, K=64).  Env override AZTEC_RAKE_UNROLL."""
    import os

    u = int(os.environ.get("AZTEC_RAKE_UNROLL", "8"))
    while u > 1 and K % u:
        u //= 2
    return max(u, 1)


@functools.lru_cache(maxsize=None)
def _rake_packed_call(spec: FieldSpec, B: int, K: int):
    """Packed-input variant: one (K*16, B/128, 128) operand carries BOTH
    affine coordinates with limb PAIRS packed per u32 (rows 0-7 = X pairs,
    8-15 = Y pairs).  Halves the dominant per-round gather (the TPU gathers
    at ~1 element/cycle regardless of element content) and keeps the whole
    pipeline K-major so no 384 MB layout transposes remain.  Each grid
    invocation runs U sequential k-steps (_unroll_for) so the fixed
    per-invocation pipeline cost is amortized."""
    import os

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = os.environ.get("AZTEC_PALLAS") == "interpret"
    kf = KF(spec)
    sentinel = np.uint32(0x1FFFF)
    M16 = np.uint32(0xFFFF)
    U = _unroll_for(K)

    def kernel(dig_ref, pk_ref, ox_ref, oy_ref, oz_ref,
               accX, accY, accZ, accd):
        ku = pl.program_id(1)

        @pl.when(ku == 0)
        def _():
            accd[:] = jnp.full((ROWS, 128), sentinel, jnp.uint32)
            z = jnp.zeros((ROWS, 128), jnp.uint32)
            for i in range(L):
                accX[i] = z
                accY[i] = z
                accZ[i] = z

        X1 = [accX[i] for i in range(L)]
        Y1 = [accY[i] for i in range(L)]
        Z1 = [accZ[i] for i in range(L)]
        prevd = accd[:]
        for u in range(U):
            dk = dig_ref[u]
            X2 = [
                (pk_ref[i // 2, u] >> np.uint32(16 * (i % 2))) & M16
                for i in range(L)
            ]
            Y2 = [
                (pk_ref[8 + i // 2, u] >> np.uint32(16 * (i % 2)))
                & M16
                for i in range(L)
            ]
            aX, aY, aZ = _f_mixed_add_unsafe(kf, [X1, Y1, Z1, X2, Y2])
            one = kf.one_mont_elem(X2)
            same = dk == prevd
            X1 = kf.select(same, aX, X2)
            Y1 = kf.select(same, aY, Y2)
            Z1 = kf.select(same, aZ, one)
            prevd = dk
            for i in range(L):
                ox_ref[u, i, 0] = X1[i]
                oy_ref[u, i, 0] = Y1[i]
                oz_ref[u, i, 0] = Z1[i]
        for i in range(L):
            accX[i] = X1[i]
            accY[i] = Y1[i]
            accZ[i] = Z1[i]
        accd[:] = prevd

    Bg = B // 128
    dig_spec = pl.BlockSpec((U, ROWS, 128), lambda b, k: (k, b, 0),
                            memory_space=pltpu.VMEM)
    # the packed operand arrives in the GATHERED layout (16, K, Bg, 128)
    # — a free bitcast view of the (16+rounds, n) gather output — so no
    # K-major relayout (measured 7.6 ms/round) is needed
    pt_spec = pl.BlockSpec((L, U, ROWS, 128), lambda b, k: (0, k, b, 0),
                           memory_space=pltpu.VMEM)
    # outputs are (U, L, K/U, Bg, 128); the host transpose below restores
    # plain (16, n) planes in K-major element order j = k*B + b, so
    # downstream consumers (tail gathers, block-tail slices) keep their
    # cheap minor-axis access patterns (2D-index flat gathers cost
    # ~75 ms/round; measured round 3)
    out_spec = pl.BlockSpec(
        (U, L, 1, ROWS, 128), lambda b, k: (0, 0, k, b, 0),
        memory_space=pltpu.VMEM,
    )

    @jax.jit
    def call(dig, packed):
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((U, L, K // U, Bg, 128), jnp.uint32)
                for _ in range(3)
            ),
            grid=(Bg // ROWS, K // U),
            in_specs=[dig_spec, pt_spec],
            out_specs=(out_spec, out_spec, out_spec),
            scratch_shapes=[
                pltpu.VMEM((L, ROWS, 128), jnp.uint32),
                pltpu.VMEM((L, ROWS, 128), jnp.uint32),
                pltpu.VMEM((L, ROWS, 128), jnp.uint32),
                pltpu.VMEM((ROWS, 128), jnp.uint32),
            ],
            interpret=interpret,
        )(dig, packed)
        # element k = ku*U + u lives at [u, :, ku] -> (L, K*Bg, 128)
        return tuple(
            o.transpose(1, 2, 0, 3, 4).reshape(L, K * Bg, 128)
            for o in outs
        )

    return call


def rake_scan_packed(dig_k, packed_k, B: int, K: int, spec: FieldSpec):
    """Fused rake on K-major packed inputs.

    dig_k: (K, B/128, 128) digits; packed_k: (16, K, B/128, 128) — the
    gathered (16, n) packed planes viewed 4-D (free bitcast), row j =
    packed limb-pair j (X pairs then Y pairs), column k*B+b = sorted
    position (k, b).  Returns scan (X, Y, Z) each (16, K*B/128, 128) —
    i.e. plain (16, n) limb planes in K-major element order j = k*B + b."""
    if not _supported(B):
        return None
    return _rake_packed_call(spec, B, K)(dig_k, packed_k)


def rake_scan(sd, pts, B: int, K: int, spec: FieldSpec):
    """Fused rake scan.  sd: (n,) sorted digits; pts: (X, Y) each (16, n)
    in sorted order.  Returns scan = (X, Y, Z) each (16, B, K), matching
    the lax.scan composition bit-for-bit.  None if shapes unsupported."""
    if not _supported(B):
        return None
    n = B * K
    X, Y = pts

    # n-order s = b*K + k  ->  K-major planes (K, 16, B) -> (K*16, B/128, 128)
    def to_kmajor(p):
        return (
            p.reshape(L, B, K).transpose(2, 0, 1).reshape(K * L, B // 128, 128)
        )

    dig = sd.reshape(B, K).T.reshape(K, B // 128, 128)
    ox, oy, oz = _rake_call(spec, B, K)(dig, to_kmajor(X), to_kmajor(Y))

    def from_kmajor(o):
        return o.reshape(K, L, B).transpose(1, 2, 0)  # (16, B, K)

    return tuple(from_kmajor(o) for o in (ox, oy, oz))
