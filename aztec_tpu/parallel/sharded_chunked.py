"""Mesh-sharded host-staged chunked MSM — the production multi-chip path.

Round 4 proved the monolithic ``msm_engine`` jit cannot compile at
realistic sizes on this backend (>12 min at 2^20), so the single-chip MSM
moved to host-staged per-stage jits (msm/chunked.py).  This module ports
that EXACT staging under a ``jax.sharding.Mesh``: chunks are the
multi-chip unit (msm/chunked.py's docstring), one chunk per device per
pass, and every per-round stage is an independent ``shard_map``-wrapped
jit whose LOCAL computation is the same single-chip stage program — so
per-device compile cost is identical to single-chip, and the host loop
drives rounds exactly as before.

Data flow (D devices, points sharded along the point axis):

  for each pass g (D chunks in parallel, one per device):
      prep     (16, D*chunk) -> packed16/scalars, still point-sharded
      8 rounds x {sort1, sort2, rake, carries, tails, fold}: all purely
               device-local (out_specs keep the point axis sharded);
               fold accumulates per-device bucket planes (leading 'dp'
               axis, local (1, L, 2^c))
  finish   per-device batched bucket phase + Horner -> width-1 partial
           (complete projective), device-local
  combine  ONE all_gather of D width-1 points + log-tree of complete
           adds -> replicated Jacobian result

Communication is O(D) group elements total (the all_gather) — bucket
planes never cross devices; scaling efficiency is bounded by the
(identical) per-device stage walls, matching the >=80% 2-host north
star.  Reference seam: the per-thread scalar slices of
scalar_multiplication.cpp:738-835 and work_queue.hpp:166-200, mapped to
whole devices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from ..curves.group_ops import JacobianOps
from ..curves.spec import CurveSpec
from ..msm import chunked
from ..msm.pippenger import _hillis_scan


@functools.lru_cache(maxsize=None)
def _sharded_fns(curve: CurveSpec, mesh: Mesh, axis: str, n_eff: int,
                 c: int, K: int, rounds: int, use_glv: bool):
    """The shard_map-wrapped ROUND-BATCHED stage programs for one
    (mesh, geometry): five chained dispatches per chunk pass, exactly the
    single-chip pipeline of chunked._stage_fns_batched run per-device."""
    ops = JacobianOps(curve)
    nbuckets = 1 << c
    local = chunked._stage_fns_batched(curve, n_eff, c, K, rounds).stages
    prep_local = chunked._prep_fn(curve, use_glv)

    def sm(fn, in_specs, out_specs):
        return jax.jit(shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        ))

    pt = P(None, axis)          # (L, n) / (R, n): point axis sharded
    p3 = P(None, axis, None)    # (16, K*Bp//128, 128) scan containers
    dv = P(axis, None, None, None)   # (D, L, R, 2^c) per-device planes

    prep = sm(prep_local, (pt, pt, pt), (pt, pt))

    sort1 = sm(lambda sc: local["sort1"](sc), (pt,), (pt, pt))

    def rake_l(sdR, idxR, packed16):
        out = local["rake"](sdR, idxR, packed16)
        return out                       # 3 scan containers + sdk

    rake = sm(rake_l, (pt, pt, pt), (p3,) * 3 + (pt,))

    carries = sm(lambda sdk, scan_k: local["carries"](sdk, scan_k),
                 (pt, (p3,) * 3), (pt,) * 3)

    def tails_l(sdR, sdk, scan_k, C):
        bj = local["tails"](sdR, sdk, scan_k, C)
        return tuple(b[None] for b in bj)

    tails = sm(tails_l, (pt, pt, (p3,) * 3, (pt,) * 3), (dv,) * 3)

    def fold_l(bacc, bj):
        out = local["fold"](tuple(b[0] for b in bacc),
                            tuple(b[0] for b in bj))
        return tuple(b[None] for b in out)

    fold = sm(fold_l, ((dv,) * 3, (dv,) * 3), (dv,) * 3)

    finish_local = chunked._finish_fn(curve, rounds, c, nbuckets,
                                      return_jacobian=False)
    dw = P(axis, None, None)    # (D, L, 1) width-1 partials

    def finish_l(bX, bY, bZ):
        out = finish_local(bX[0], bY[0], bZ[0])   # width-1 complete proj
        return tuple(b[None] for b in out)

    finish = sm(finish_l, (dv,) * 3, (dw,) * 3)

    def combine_l(pX, pY, pZ):
        parts = tuple(
            jax.lax.all_gather(a[0], axis_name=axis, axis=0)
            for a in (pX, pY, pZ)
        )  # (D, L, 1)
        wide = tuple(jnp.moveaxis(g[..., 0], 0, -1) for g in parts)  # (L, D)
        tot = _hillis_scan(ops, wide, ops.c_add)
        return ops.c2j(tuple(a[..., -1:] for a in tot))

    combine = sm(combine_l, (dw,) * 3, (P(),) * 3)

    return {
        "prep": prep, "sort1": sort1, "rake": rake,
        "carries": carries, "tails": tails, "fold": fold,
        "finish": finish, "combine": combine,
    }


def sharded_msm_chunked(mesh: Mesh, axis: str, points, scalars,
                        curve: CurveSpec, *, c: int = 16,
                        use_glv: bool = True,
                        chunk_log2: int | None = None,
                        K: int | None = None):
    """MSM with points/scalars sharded along ``axis`` of ``mesh``.

    points: (X, Y) affine Montgomery limb planes (L, n); scalars (L, n)
    canonical uint32 planes.  Concrete (non-traced) inputs; the host
    drives the per-round stage programs, all dispatches asynchronous.
    Returns a width-1 Jacobian tuple, replicated.
    """
    from ..msm import glv as glv_mod

    X, Y = points
    n = X.shape[1]
    D = mesh.shape[axis]
    use_glv = use_glv and glv_mod.glv_params(curve) is not None
    rounds = (128 if use_glv else 256) // c
    nbuckets = 1 << c

    if chunk_log2 is None:
        nloc = -(-n // D)
        chunk_log2, K_auto = chunked.geometry_for(nloc, use_glv, c)
        K = K_auto if K is None else K
    chunk = 1 << chunk_log2
    n_eff, _ = chunked._chunk_geometry(chunk_log2, use_glv, K)
    assert chunked.supported(chunk_log2, use_glv, K, c), (chunk_log2, K, c)

    # pad to a whole number of passes: D chunks per pass
    span = D * chunk
    pad = (-n) % span
    if pad:
        X = jnp.concatenate([X, jnp.tile(X[:, :1], (1, pad))], axis=1)
        Y = jnp.concatenate([Y, jnp.tile(Y[:, :1], (1, pad))], axis=1)
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((scalars.shape[0], pad), jnp.uint32)],
            axis=1)
        n += pad

    fns = _sharded_fns(curve, mesh, axis, n_eff, c, K, rounds, use_glv)
    ops = JacobianOps(curve)

    shard = jax.sharding.NamedSharding(mesh, P(axis, None, None, None))
    acc = tuple(
        jax.device_put(jnp.broadcast_to(a[None], (D,) + a.shape), shard)
        for a in ops.c_infinity((rounds, nbuckets))
    )

    import os

    log = os.environ.get("AZTEC_DRYRUN_LOG")

    def _trace(name, val):
        if log:
            import sys
            import time

            t0 = time.perf_counter()
            jax.block_until_ready(val)
            print(f"#   sharded {name}: {time.perf_counter()-t0:.1f}s",
                  file=sys.stderr, flush=True)
        return val

    pt_shard = jax.sharding.NamedSharding(mesh, P(None, axis))
    for base in range(0, n, span):
        Xg = jax.device_put(X[:, base:base + span], pt_shard)
        Yg = jax.device_put(Y[:, base:base + span], pt_shard)
        Sg = jax.device_put(scalars[:, base:base + span], pt_shard)
        packed16, sc = _trace("prep", fns["prep"](Xg, Yg, Sg))
        sdR, idxR = _trace("sort1", fns["sort1"](sc))
        rk = _trace("rake", fns["rake"](sdR, idxR, packed16))
        scan_k, sdk = rk[:3], rk[3]
        C = _trace("carries", fns["carries"](sdk, tuple(scan_k)))
        bj = _trace("tails", fns["tails"](sdR, sdk, tuple(scan_k),
                                          tuple(C)))
        acc = _trace("fold", fns["fold"](tuple(acc), tuple(bj)))

    part = _trace("finish", fns["finish"](*acc))
    return fns["combine"](*part)
