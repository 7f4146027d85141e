"""Chunked fixed-geometry Pippenger MSM, round-batched per chunk.

Design constraints, both MEASURED on the tunneled v5e backend:

- per-size warmup is dominated by Python TRACING of the fused Pallas
  kernels (~80 s for the rake alone; the persistent compile cache cannot
  hide trace cost), so geometry must be FIXED: points are processed in
  right-sized chunks (2^14..2^17; a 2^20 MSM is 8 chunks of 2^17) and
  every executable is traced once per geometry per process;
- independent dispatch roots cost 10-35 ms while dependency-chained
  dispatches cost ~0.16 ms (tools/chip_probe.py dep-test, r5), so a
  chunk is FIVE chained dispatches with all GLV rounds batched inside
  each stage, not rounds x stages separate calls.

Per-chunk pipeline (each stage a jit, all rounds R=8 batched):

  prep    GLV split + endo table + limb-pair packing -> (16, n_eff)
  sort1   ONE batched bitonic sort of (digit, source-index) pairs for
          all R rounds (payload = 4 bytes, not the 64-byte point rows —
          lax.sort is O(log^2 n) passes over every payload byte)
  rake    K-major index transpose + ONE point-row gather + the fused
          rake kernel over a combined R*B lane axis (lanes independent;
          round boundaries = lane boundaries)
  carries Hillis-Steele segmented scan of block tails (continuation
          masked at round edges)
  tails   bucket edges from a two-level one-hot bf16 MXU histogram +
          cumsum (no searchsorted: its scan lowering costs ~30 ns/probe);
          fused row gathers of scan tails + carries; arithmetic
          first-run flags -> Jacobian bucket planes (16, R, 2^c)
  fold    one complete add into the running (16, R, 2^c) planes

Buckets accumulate across chunks (MSM is linear in the point set); the
bucket phase then runs ONCE per MSM, round-batched (_finish), ending in
the width-1 Horner fold acc = 2^c acc + W_r.

Everything is bit-identical to the engine's packed path (same kernels,
same formulas, different staging); bench.py golden-checks every size.

Reference bar: scalar_multiplication.cpp:145-167 (2^20 MSM ~ 2^24 adds);
the sort1+gather staging is the reference's point_schedule idea
(scalar_multiplication.cpp:198-260) restaged for TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..curves.group_ops import JacobianOps
from ..curves.spec import CurveSpec
from . import pippenger as pp

CHUNK_LOG2 = 17   # points per chunk (table doubles under GLV)
RAKE_K = 64       # serial rake depth; B = n_eff / K

# floor for right-sized chunks (VERDICT r4 weak #1: a 2^14 MSM must not
# pay a full 2^17-point chunk — 8x padded work).  Each distinct geometry
# costs one extra lazy rake trace, paid only by processes that use it.
# 2^11 is the smallest chunk the packed geometry supports (K=4, B=1024)
# — it exists for the CPU-mesh dryrun, where every padded point costs
# real single-core field muls.
SMALL_CHUNK_LOG2 = 11


def geometry_for(n: int, use_glv: bool, c: int = 16):
    """(chunk_log2, K) for an n-point MSM: the chunk is clamped to the
    MSM size (within [SMALL_CHUNK_LOG2, CHUNK_LOG2]) and K is the largest
    power of two the packed rake geometry supports."""
    log2 = max(SMALL_CHUNK_LOG2,
               min(CHUNK_LOG2, max(1, (max(n, 2) - 1).bit_length())))
    for lg in range(log2, CHUNK_LOG2 + 1):
        for K in (RAKE_K, 32, 16, 8, 4, 2, 1):
            if supported(lg, use_glv, K, c):
                return lg, K
    return CHUNK_LOG2, RAKE_K


def _chunk_geometry(chunk_log2: int, use_glv: bool, K: int):
    n_eff = (2 if use_glv else 1) << chunk_log2
    B = n_eff // K
    return n_eff, B


def supported(chunk_log2: int, use_glv: bool, K: int, c: int) -> bool:
    n_eff, B = _chunk_geometry(chunk_log2, use_glv, K)
    return (
        n_eff % K == 0 and B >= 1024 and B % 1024 == 0
        and (1 << c) % 1024 == 0
        # sort1 extracts each c-bit digit from a single 16-bit limb row;
        # windows straddling limb boundaries (c=10, c=12, ...) would
        # silently produce wrong digits (ADVICE r4 medium #2)
        and 16 % c == 0
    )


@functools.lru_cache(maxsize=None)
def _ri_consts(rounds: int):
    """Device-resident round indices: a fresh ``jnp.int32(ri)`` per stage
    call is a host->device transfer on every dispatch — measurable
    overhead on the tunneled backend.  Committed once per process."""
    return [jnp.int32(i) for i in range(rounds)]


@functools.lru_cache(maxsize=None)
def _prep_fn(curve: CurveSpec, use_glv: bool):
    """(X, Y, scalars) chunk -> (packed16 (16, n_eff), digit planes)."""
    ops = JacobianOps(curve)

    @jax.jit
    def prep(X, Y, scalars):
        if use_glv:
            from . import glv as glv_mod

            (X, Y), scalars = glv_mod.glv_table((X, Y), scalars, curve)
        return ops.pack_affine((X, Y), force=True), scalars

    return prep


def _mapped_pairwise(f, A, B, pieces: int = 64):
    """Apply the elementwise group op ``f(A, B)`` in ``pieces`` slices of
    the last axis via ONE loop-rolled lax.map body.

    Off-TPU only: XLA:CPU compile time/memory for a fused limb group
    formula scales with the flattened width — a single add at
    (16, 8, 65536) ran >90 min and 50 GB of compiler RSS (r5); a
    width-8192 body compiles in minutes and the map replays it.  On TPU
    the direct call is both correct and fastest."""
    from ..ff import pallas_field as pf

    if pf.use_pallas() or A[0].shape[-1] % pieces:
        return f(A, B)

    def sp(x):
        x = jnp.broadcast_to(x, A[0].shape)
        return jnp.moveaxis(
            x.reshape(x.shape[:-1] + (pieces, x.shape[-1] // pieces)),
            -2, 0)

    SA = tuple(sp(x) for x in A)
    SB = tuple(sp(x) for x in B)
    out = lax.map(lambda ab: f(ab[0], ab[1]), (SA, SB))

    def unsp(o):
        m = jnp.moveaxis(o, 0, -2)
        return m.reshape(m.shape[:-2] + (-1,))

    return tuple(unsp(o) for o in out)


@functools.lru_cache(maxsize=None)
def _stage_fns_batched(curve: CurveSpec, n: int, c: int, K: int, R: int):
    """Round-BATCHED per-chunk device programs (round-5 redesign).

    Why: on the tunneled backend, independent dispatch roots cost
    10-35 ms each while dependency-chained dispatches cost ~0.16 ms
    (tools/chip_probe.py dep-test, measured r5).  The per-round six-stage
    pipeline paid that toll 48x per chunk; batching all R rounds into
    each stage cuts a chunk to FIVE chained dispatches and lets the
    device see wide (R x n) operands.

    Two algorithmic upgrades ride along:

    - sort2 is GONE: its key km = (r%K)*B + r//K is a fixed permutation,
      so the K-major relayout is a (R, B, K) -> (K, R*B) transpose fused
      into the rake dispatch, not a 17-payload radix sort.
    - the rake runs ONE fused kernel over a combined lane axis
      B' = R*B (lanes are independent; round boundaries become lane
      boundaries), so the same pallas kernel serves all rounds in one
      call.  Cross-block carries mask continuation across round edges.

    Returns an object with .stages = {sort1, rake, carries, tails, fold}.
    """
    ops = JacobianOps(curve)
    B = n // K
    Bp = R * B                      # combined lane axis
    nbuckets = 1 << c
    mask_c = jnp.uint32(nbuckets - 1)

    @jax.jit
    def sort1(scalars):
        """Sort (digit, source-index) pairs for ALL R rounds at once.

        The point rows do NOT ride the sort (the r4 design paid a
        17-payload radix sort + relayout): the rake stage re-reads them
        with one fused row gather of the prep-materialized (n, 16) table
        — the reference's point_schedule idea (scalar_multiplication.
        cpp:198-260), restaged for the TPU's fast gather lowering."""
        rows = []
        for ri in range(R):
            limb_row = scalars[(c * ri) // 16]
            rows.append((limb_row >> jnp.uint32((c * ri) % 16)) & mask_c)
        digR = jnp.stack(rows, axis=0)                      # (R, n)
        iota = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.uint32)[None], (R, n))
        return lax.sort((digR, iota), dimension=1, num_keys=1)

    def _kmajor(x):
        # (R, n) rank-major -> (K, R*B) K-major lanes (lane = r*B + b)
        return x.reshape(R, B, K).transpose(2, 0, 1).reshape(K, Bp)

    @jax.jit
    def rake(sdR, idxR, packed16):
        dig_k = _kmajor(sdR)
        colk = _kmajor(idxR).reshape(K * Bp)
        # ONE per-chunk point gather into K-major order (~21 ns/elem on
        # this chip for every orientation tried — chip_probe gather2-test;
        # the r4 alternative, 17 payload rows riding the radix sort +
        # transposes, moves the same bytes for the same cost with 3x the
        # sort passes)
        SPk = jnp.take(packed16, colk, axis=1)
        pk = SPk.reshape(16, K, Bp // 128, 128)
        scan_k = ops.rake_scan_packed(
            dig_k.reshape(K, Bp // 128, 128), pk, Bp, K)
        return scan_k + (dig_k,)

    @jax.jit
    def carries(sdk, scan_k):
        T = tuple(sc.reshape(16, K * Bp)[:, (K - 1) * Bp:] for sc in scan_k)
        internal = jnp.any(sdk[1:] != sdk[:-1], axis=0)
        h, t = sdk[0], sdk[K - 1]
        # no run continues across a round boundary (lane % B == 0)
        edge = (jnp.arange(Bp) % B) == 0
        cont = jnp.concatenate([jnp.array([False]), h[1:] == t[:-1]])
        cont = cont & ~edge
        flag = internal | ~cont
        scanned = pp._hillis_seg_scan(ops, T, flag)
        return ops.select(cont, pp._roll(scanned, 1),
                          ops.infinity((Bp,)))

    def _digit_counts(sdR):
        """counts[r, j] = #digits_r == j via a two-level one-hot MXU
        histogram: digit = hi*256 + lo, H2[hi, lo] = A_hi^T A_lo with
        0/1 bf16 one-hots and f32 accumulation — exact (counts <= n <
        2^24).  Replaces searchsorted entirely: the scan lowering costs
        ~30 ns/probe (315 ms/chunk) and even the sort-based method costs
        29 ms; two 256-wide matmuls per round ride the MXU at ~1 ms
        (chip_probe tails-test, r5)."""
        ar = jnp.arange(256, dtype=sdR.dtype)
        outs = []
        for r in range(R):
            hi = (sdR[r] >> jnp.uint32(8))[:, None] == ar[None]
            lo = (sdR[r] & jnp.uint32(0xFF))[:, None] == ar[None]
            h2 = jax.lax.dot_general(
                hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (256, 256)
            outs.append(h2.reshape(nbuckets))
        return jnp.round(jnp.stack(outs)).astype(jnp.int32)  # (R, nb)

    @jax.jit
    def tails(sdR, sdk, scan_k, C):
        from ..ff import pallas_field as _pf

        if _pf.use_pallas():          # TPU: MXU histogram
            counts = _digit_counts(sdR)
            edges = jnp.concatenate(
                [jnp.zeros((R, 1), jnp.int32),
                 jnp.cumsum(counts, axis=1, dtype=jnp.int32)], axis=1)
        else:
            # CPU (mesh dryruns/tests): the bf16 one-hot dots blow up the
            # XLA:CPU compiler (>49 GB compile RSS observed r5); binary
            # search is cheap on CPU
            q = jnp.arange(nbuckets + 1).astype(sdR.dtype)
            edges = jax.vmap(
                lambda s: jnp.searchsorted(s, q))(sdR).astype(jnp.int32)
        jidx = jnp.arange(nbuckets)[None]
        count_j = edges[:, 1:] - edges[:, :-1]
        valid = (count_j > 0) & (jidx > 0)                  # (R, nb)
        tc = jnp.clip(edges[:, 1:].astype(jnp.int32) - 1, 0, n - 1)
        kk = tc % K                                          # serial step
        lane = jnp.arange(R, dtype=jnp.int32)[:, None] * B + tc // K
        col = (kk * Bp + lane).reshape(R * nbuckets)
        # Per-coordinate fused row gathers: take(T.T, cols).T is the fast
        # TPU gather lowering (0.76 ms at 2^19 rows from a 2^21 table);
        # the minor-axis form costs 232 ms (chip_probe gather-test).
        g = tuple(
            jnp.take(sc.reshape(16, K * Bp).T, col, axis=0).T
            .reshape(16, R, nbuckets) for sc in scan_k)
        # bucket j's tail sits in its lane's FIRST run iff the run began
        # at or before the lane's first element — arithmetic on edges,
        # no gather (the r4 design gathered a flag plane instead)
        frj = edges[:, :-1].astype(jnp.int32) <= tc - (tc % K)
        # carry table: explicitly materialize the (Bp, 48) row-major
        # transpose (optimization_barrier) — the FUSED small-table form
        # costs 110 ms (chip_probe tails-test)
        CVT = lax.optimization_barrier(
            jnp.concatenate(C, axis=0).T)                    # (Bp, 48)
        CR = jnp.take(CVT, lane.reshape(R * nbuckets), axis=0).T
        cg = tuple(CR[16 * i:16 * (i + 1)].reshape(16, R, nbuckets)
                   for i in range(3))
        carry = ops.select(frj & valid, cg,
                           ops.infinity((R, nbuckets)))
        bt = _mapped_pairwise(ops.add_unsafe, g, carry)
        return ops.select(valid, bt, ops.infinity((R, nbuckets)))

    @jax.jit
    def fold(bacc, bj):
        return _mapped_pairwise(
            lambda a, b: ops.c_add(a, ops.j2c(b)), bacc, bj)

    def chunk_buckets(PT, scalars, bacc):
        """ONE chunk, ALL rounds: 5 chained dispatches."""
        sdR, idxR = sort1(scalars)
        rk = rake(sdR, idxR, PT)
        scan_k, sdk = rk[:3], rk[3]
        C = carries(sdk, scan_k)
        bj = tails(sdR, sdk, scan_k, C)
        return fold(bacc, bj)

    chunk_buckets.stages = {
        "sort1": sort1, "rake": rake, "carries": carries,
        "tails": tails, "fold": fold,
    }
    return chunk_buckets


def _bucket_phase_batched(ops, buckets, nbuckets: int, K2: int):
    """W_r = sum_{j>=1} j * B_{r,j} for every round r at once.

    buckets: complete-projective planes (16, R, nbuckets).  Returns a
    width-(R,) tuple.  Same suffix-sum algebra as pippenger._bucket_phase,
    restaged with an explicit round batch axis so ONE pass (and one set of
    fused-kernel launches) serves all rounds."""
    R = buckets[0].shape[1]
    B2 = nbuckets // K2
    rev = tuple(jnp.flip(b, axis=-1) for b in buckets)      # suffix -> prefix
    rb = tuple(b.reshape(b.shape[:-1] + (B2, K2)) for b in rev)
    rbk = tuple(jnp.moveaxis(b, -1, 0) for b in rb)          # (K2, 16, R, B2)

    inf = ops.c_infinity((R, B2))

    def step(acc, xs):
        acc = ops.c_add(acc, tuple(xs))
        return acc, acc

    totals, stacked = lax.scan(step, inf, rbk)
    local = tuple(jnp.moveaxis(s, 0, -1) for s in stacked)   # (16, R, B2, K2)

    # exclusive carry of lane totals along B2
    scanned = pp._hillis_scan(ops, totals, ops.c_add)
    idx2 = jnp.arange(B2)
    carry = ops.select(idx2 >= 1, pp._roll(scanned, 1),
                       ops.c_infinity((R, B2)))

    S = _mapped_pairwise(ops.c_add, local,
                         tuple(cc[..., None] for cc in carry))
    Sf = tuple(s.reshape(s.shape[:-2] + (nbuckets,)) for s in S)
    keep = jnp.arange(nbuckets) != (nbuckets - 1)
    Sf = ops.c_mask_to_infinity(keep, Sf)

    sb = tuple(s.reshape(s.shape[:-1] + (B2, K2)) for s in Sf)

    def sumstep(k, acc):
        Pk = tuple(
            lax.dynamic_index_in_dim(b, k, axis=b.ndim - 1, keepdims=False)
            for b in sb
        )
        return ops.c_add(acc, Pk)

    colsum = lax.fori_loop(0, K2, sumstep, ops.c_infinity((R, B2)))
    tot = pp._hillis_scan(ops, colsum, ops.c_add)
    return tuple(a[..., -1] for a in tot)                    # (16, R)


def _finish(ops, buckets, R: int, c: int, nbuckets: int,
            return_jacobian: bool):
    """Batched bucket phase over all rounds + width-1 Horner fold.

    buckets: complete-projective planes (*, R, nbuckets).  Group-generic
    (unit-tested against IntModOps)."""
    W = _bucket_phase_batched(ops, buckets, nbuckets,
                              min(64, nbuckets // 1024 or 1))
    # Horner over rounds, MSB digit first: acc = 2^c acc + W[ri]
    acc = ops.c_infinity((1,))
    for ri in range(R - 1, -1, -1):
        acc = ops.c_dbl_n(acc, c)
        acc = ops.c_add(acc, tuple(w[..., ri:ri + 1] for w in W))
    return ops.c2j(acc) if return_jacobian else acc


@functools.lru_cache(maxsize=None)
def _finish_fn(curve: CurveSpec, R: int, c: int, nbuckets: int,
               return_jacobian: bool):
    ops = JacobianOps(curve)

    @jax.jit
    def finish(bX, bY, bZ):
        return _finish(ops, (bX, bY, bZ), R, c, nbuckets, return_jacobian)

    return finish


def msm_chunked(points, scalars, curve: CurveSpec, *,
                chunk_log2: int | None = None, c: int = 16,
                K: int | None = None,
                use_glv: bool = True, return_jacobian: bool = True):
    """MSM over concrete (non-traced) inputs with fixed chunk geometry.

    points: (X, Y) affine Montgomery limb planes (16, n), all finite
    (prover SRS contract); scalars: (16, n) canonical uint32 limb planes.
    n is padded internally to a chunk multiple with copies of point 0 and
    zero scalars (digit-0 entries land in the dropped bucket 0).
    """
    from . import glv as glv_mod

    X, Y = points
    n = X.shape[1]
    use_glv = use_glv and glv_mod.glv_params(curve) is not None
    if chunk_log2 is None:
        auto_log2, auto_K = geometry_for(n, use_glv)
        chunk_log2 = auto_log2
        K = auto_K if K is None else K
    elif K is None:
        K = RAKE_K if chunk_log2 >= CHUNK_LOG2 else SMALL_RAKE_K
    assert supported(chunk_log2, use_glv, K, c), (chunk_log2, K, c)
    chunk = 1 << chunk_log2
    rounds = (128 if use_glv else 256) // c
    n_eff, _ = _chunk_geometry(chunk_log2, use_glv, K)
    nbuckets = 1 << c

    pad = (-n) % chunk
    if pad:
        X = jnp.concatenate([X, jnp.tile(X[:, :1], (1, pad))], axis=1)
        Y = jnp.concatenate([Y, jnp.tile(Y[:, :1], (1, pad))], axis=1)
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((scalars.shape[0], pad), jnp.uint32)], axis=1
        )
        n += pad

    prep = _prep_fn(curve, use_glv)
    chunk_buckets = _stage_fns_batched(curve, n_eff, c, K, rounds)
    ops = JacobianOps(curve)

    # running bucket planes (L, R, 2^c), all rounds at once; every
    # dispatch below is dependency-chained and async — ONE device
    # pipeline with a single sync at the very end (caller's block)
    acc = tuple(
        jnp.asarray(a) for a in ops.c_infinity((rounds, nbuckets))
    )
    for base in range(0, n, chunk):
        packed16, sc = prep(X[:, base:base + chunk],
                            Y[:, base:base + chunk],
                            scalars[:, base:base + chunk])
        acc = chunk_buckets(packed16, sc, acc)

    return _finish_fn(curve, rounds, c, nbuckets, return_jacobian)(*acc)
