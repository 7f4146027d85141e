"""Host-driven staged Pippenger MSM: a few small jits instead of one
mega-module.

Why this exists (round-4 measurement): the monolithic MSM jit — GLV table
+ an 8-round ``lax.fori_loop`` whose body contains argsort, a 100 MB
gather, two fused Pallas kernels and three Hillis-Steele scans — spent
>12 min in local XLA compilation at n=2^20 on the axon TPU backend and
did not finish a warmup inside 30 min.  The SAME phases split into their
own jits compile in ~30 s total (scripts/msm_dissect.py) and the tunnel's
per-dispatch latency is only ~30-70 us (scripts/tunnel_probe2.py), so
driving the round loop from Python costs microseconds while cutting
compile time by two orders of magnitude.  Compile artifacts are also far
more cache-stable: each phase's HLO is shared across MSM sizes with the
same geometry.

Structure (identical math to msm_engine's packed path, same kernels):

  prep  = jit(GLV split + endo table + limb-pair packing)
  round = jit(_packed_round)        # ri is a DYNAMIC argument: 1 compile
  finish= jit(proj -> Jacobian)

The round loop runs MSB-first from Python; each call returns the width-1
complete-projective accumulator acc' = 2^c acc + W_ri.

Reference analog: pippenger_runtime_state drives rounds from the host in
the reference too (scalar_multiplication.cpp:923-1008); this is the same
seam, with the per-round internals fully fused on-device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.group_ops import JacobianOps
from ..curves.spec import CurveSpec
from . import pippenger as pp


def geometry(n_eff: int, c: int, K: int) -> bool:
    """True when the packed fused-Pallas geometry supports (n_eff, K)."""
    B = n_eff // K
    return n_eff % K == 0 and B >= 1024 and B % 1024 == 0


@functools.lru_cache(maxsize=None)
def _prep_fn(curve: CurveSpec, use_glv: bool):
    ops = JacobianOps(curve)

    @jax.jit
    def prep(X, Y, scalars):
        if use_glv:
            from . import glv as glv_mod

            (X, Y), scalars = glv_mod.glv_table((X, Y), scalars, curve)
        return ops.pack_affine((X, Y)), scalars

    return prep


@functools.lru_cache(maxsize=None)
def _round_fn(curve: CurveSpec, n: int, c: int, K: int):
    ops = JacobianOps(curve)
    mask_c = jnp.uint32((1 << c) - 1)

    @jax.jit
    def round_step(packed16, scalars, aX, aY, aZ, ri):
        # ri is DYNAMIC: one compiled executable serves all rounds
        limb_row = jax.lax.dynamic_index_in_dim(
            scalars, (c * ri) // 16, axis=0, keepdims=False)
        d = (limb_row >> ((c * ri) % 16).astype(jnp.uint32)) & mask_c
        return pp._packed_round(ops, packed16, d, (aX, aY, aZ),
                                n=n, c=c, K=K)

    return round_step


@functools.lru_cache(maxsize=None)
def _finish_fn(curve: CurveSpec):
    ops = JacobianOps(curve)
    return jax.jit(lambda aX, aY, aZ: ops.c2j((aX, aY, aZ)))


def msm_staged(points, scalars, curve: CurveSpec, n: int, c: int, K: int,
               use_glv: bool, return_jacobian: bool = True):
    """Staged MSM on concrete (non-traced) inputs.

    points: (X, Y) affine Montgomery planes (L, n); scalars (16, n)
    canonical planes; n already padded so the GLV-doubled table fits the
    packed geometry.  Returns a width-1 Jacobian tuple (or the complete
    projective accumulator when return_jacobian=False).
    """
    X, Y = points
    rounds = (128 if use_glv else 256) // c
    n_eff = (2 * n) if use_glv else n

    packed16, sc = _prep_fn(curve, use_glv)(X, Y, scalars)
    round_step = _round_fn(curve, n_eff, c, K)

    from .chunked import _ri_consts

    ops = JacobianOps(curve)
    ri_dev = _ri_consts(rounds)
    acc = tuple(jnp.asarray(a) for a in ops.c_infinity((1,)))
    for ri in range(rounds - 1, -1, -1):
        acc = round_step(packed16, sc, *acc, ri_dev[ri])
    if not return_jacobian:
        return acc
    return _finish_fn(curve)(*acc)
