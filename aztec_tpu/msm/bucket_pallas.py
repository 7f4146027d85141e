"""Fully-fused Pallas bucket-phase kernel for the Pippenger MSM.

The bucket phase computes W = sum_{j>=1} j * B_j over 2^c buckets.  The
XLA composition (msm/pippenger.py _bucket_phase: lax.scan of complete adds
+ Hillis-Steele scans) costs ~96 ms/round at c=16 on v5e — ~80 device
launches each paying ~1 ms of dispatch+HBM latency for ~microseconds of
arithmetic.  This kernel runs the WHOLE phase in ONE pallas_call:

- the reversed bucket stream is split into B2=1024 lanes x K2 serial
  steps; grid (K2,), K-major blocks exactly like msm/rake_pallas.py;
- each step folds one block into per-lane running sums (`tot`) and
  running-sum-of-running-sums (`lanesum`), both living in VMEM scratch
  (the j2c conversion from the engine's Jacobian buckets is folded into
  the block load);
- at the last step an in-register tail combines the lanes:

    W = sum_l lanesum_l + K2 * (F(tot) - T) - T

  where F(tot) = sum of prefix sums of the lane totals and T is the grand
  total.  (Identity: with r = reversed buckets, sum_j (j+1) B_j =
  sum_l lanesum_l + K2 * sum_l carry_l; subtracting T leaves
  sum_j j B_j.)  The prefix sums run as a blocked Hillis-Steele scan
  ACROSS the (8, 128) tile with pltpu.roll (7 lane steps + 3 sublane
  steps), and the reductions as roll butterflies — ~50 complete-add
  bodies total, all in registers.

Reference analog: the bucket accumulation/aggregation of
scalar_multiplication.cpp:720-835, re-thought as a vector suffix-sum.
Bit-compatibility note: the result is the same GROUP ELEMENT as the XLA
path but in a different complete-projective representative (different
addition order); compare after normalization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.pallas_field import KF, L
from ..ff.spec import FieldSpec
from ..curves.group_pallas import _b3_limbs, _make_proj_add, _make_proj_dbl

B2 = 1024          # lanes: one (8, 128) tile per limb row
ROWS = B2 // 128   # 8


def supported(nbuckets: int) -> bool:
    k2 = nbuckets // B2
    return (nbuckets % B2 == 0 and k2 >= 1 and (k2 & (k2 - 1)) == 0)


def _f_j2c(kf: KF, X, Y, Z):
    """Jacobian -> complete homogeneous projective (group.jacobian_to_proj)."""
    Xp = kf.mul(X, Z)
    Zp = kf.mul(kf.sqr(Z), Z)
    inf = kf.is_zero(Z)
    Yp = kf.select(inf, kf.one_mont_elem(Y), Y)
    return Xp, Yp, Zp


@functools.lru_cache(maxsize=None)
def _bucket_call(spec: FieldSpec, b_int: int, K2: int, dbl_steps: int = 0):
    import os

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = os.environ.get("AZTEC_PALLAS") == "interpret"
    kf = KF(spec)
    b3 = _b3_limbs(spec, b_int)
    c_add2 = _make_proj_add(b3)
    c_dbl = _make_proj_dbl(b3)

    def c_add(P, Q):
        return c_add2(kf, list(P) + list(Q))

    def roll(x, d, axis):
        return pltpu.roll(x, d, axis)

    def roll_pt(P, d, axis):
        return [[roll(t, d, axis) for t in coord] for coord in P]

    def sel_pt(mask, A, B):
        return [kf.select(mask, a, b) for a, b in zip(A, B)]

    def neg_pt(P):
        X, Y, Z = P
        zero = kf.zero(Y)
        return [X, kf.sub(zero, Y), Z]

    def kernel(xr, yr, zr, ax, ay, az, ox, oy, oz, rX, rY, rZ, sX, sY, sZ):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            z = jnp.zeros((ROWS, 128), jnp.uint32)
            for i in range(L):
                rX[i] = z
                rZ[i] = z
                sX[i] = z
                sZ[i] = z
                rY[i] = jnp.full((ROWS, 128), np.uint32(kf.one_mont[i]))
                sY[i] = jnp.full((ROWS, 128), np.uint32(kf.one_mont[i]))

        blk = _f_j2c(kf, [xr[i] for i in range(L)], [yr[i] for i in range(L)],
                     [zr[i] for i in range(L)])
        run = c_add([ [rX[i] for i in range(L)],
                      [rY[i] for i in range(L)],
                      [rZ[i] for i in range(L)] ], blk)
        ls = c_add([ [sX[i] for i in range(L)],
                     [sY[i] for i in range(L)],
                     [sZ[i] for i in range(L)] ], run)
        for i in range(L):
            rX[i], rY[i], rZ[i] = run[0][i], run[1][i], run[2][i]
            sX[i], sY[i], sZ[i] = ls[0][i], ls[1][i], ls[2][i]

        @pl.when(k == K2 - 1)
        def _():
            colidx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
            rowidx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0)
            zero = jnp.zeros((ROWS, 128), jnp.uint32)
            inf = [[zero] * L,
                   [jnp.full((ROWS, 128), np.uint32(c))
                    for c in kf.one_mont], [zero] * L]
            tot = run
            # inclusive prefix scan of tot across the flat lane index
            # l = row*128 + col: 7 in-row steps, then a 3-step row scan
            P = tot
            for d in (1, 2, 4, 8, 16, 32, 64):
                P = sel_pt(colidx >= d, c_add(P, roll_pt(P, d, 1)), P)
            rowtot = [[jnp.broadcast_to(t[:, 127:128], (ROWS, 128))
                       for t in coord] for coord in P]
            RS = rowtot
            for d in (1, 2, 4):
                RS = sel_pt(rowidx >= d, c_add(RS, roll_pt(RS, d, 0)), RS)
            carry = sel_pt(rowidx >= 1, roll_pt(RS, 1, 0), inf)
            P = c_add(P, carry)
            # T: grand total = RS at the last row, broadcast
            T = [[jnp.broadcast_to(t[ROWS - 1:ROWS, :], (ROWS, 128))
                  for t in coord] for coord in RS]
            # all-reduce butterflies: F = sum_l P_l,  A = sum_l lanesum_l
            F = P
            A = ls
            for d in (1, 2, 4, 8, 16, 32, 64):
                F = c_add(F, roll_pt(F, d, 1))
                A = c_add(A, roll_pt(A, d, 1))
            for d in (1, 2, 4):
                F = c_add(F, roll_pt(F, d, 0))
                A = c_add(A, roll_pt(A, d, 0))
            negT = neg_pt(T)
            D = c_add(F, negT)
            for _ in range(max(K2.bit_length() - 1, 0)):  # D *= K2
                D = c_dbl(kf, D)
            W = c_add(c_add(A, D), negT)
            # fold the per-round accumulator shift in: acc' = 2^c acc + W
            # (saves the width-1 c_dbl_n + c_add XLA dispatches per round)
            Acc = [[ax[i] for i in range(L)], [ay[i] for i in range(L)],
                   [az[i] for i in range(L)]]
            for _ in range(dbl_steps):
                Acc = c_dbl(kf, Acc)
            W = c_add(Acc, W)
            for i in range(L):
                ox[i] = W[0][i]
                oy[i] = W[1][i]
                oz[i] = W[2][i]

    pt_spec = pl.BlockSpec((L, ROWS, 128), lambda k: (k, 0, 0),
                           memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((L, ROWS, 128), lambda k: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((L, ROWS, 128), lambda k: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def call(xk, yk, zk, ax, ay, az):
        return pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((L, ROWS, 128), jnp.uint32)
                for _ in range(3)
            ),
            grid=(K2,),
            in_specs=[pt_spec, pt_spec, pt_spec,
                      acc_spec, acc_spec, acc_spec],
            out_specs=(out_spec, out_spec, out_spec),
            scratch_shapes=[pltpu.VMEM((L, ROWS, 128), jnp.uint32)
                            for _ in range(6)],
            interpret=interpret,
        )(xk, yk, zk, ax, ay, az)

    return call


def bucket_phase(buckets, nbuckets: int, spec: FieldSpec, b_int: int,
                 acc=None, dbl_steps: int = 0):
    """From JACOBIAN bucket planes (16, nbuckets):

      acc=None:  W = sum_{j>=1} j * B_j                    (width-1)
      acc given: acc' = 2^dbl_steps * acc + W              (width-1)

    acc/result are complete-projective tuples.  Returns None if the shape
    is unsupported (caller falls back to the XLA composition)."""
    if not supported(nbuckets):
        return None
    K2 = nbuckets // B2

    def kmajor(p):
        rev = jnp.flip(p, axis=-1)
        return (rev.reshape(L, B2, K2).transpose(2, 0, 1)
                .reshape(K2 * L, ROWS, 128))

    if acc is None:
        kf = KF(spec)
        acc = (jnp.zeros((L, 1), jnp.uint32),
               jnp.asarray(np.asarray(kf.one_mont, np.uint32)[:, None]),
               jnp.zeros((L, 1), jnp.uint32))
        dbl_steps = 0

    def acc_tile(a):
        return jnp.broadcast_to(a[:, 0][:, None, None], (L, ROWS, 128))

    X, Y, Z = buckets
    ox, oy, oz = _bucket_call(spec, b_int, K2, dbl_steps)(
        kmajor(X), kmajor(Y), kmajor(Z),
        acc_tile(acc[0]), acc_tile(acc[1]), acc_tile(acc[2]))
    return tuple(o.reshape(L, B2)[:, :1] for o in (ox, oy, oz))
