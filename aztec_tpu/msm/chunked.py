"""Chunked fixed-geometry Pippenger MSM: one compile serves every size.

Why (round-4 root cause): the MSM's per-size warmup cost is dominated by
Python TRACING of the fused Pallas kernels — not backend compilation, so
the persistent compile cache cannot hide it.  Measured on this host:
82 s to trace+lower the rake kernel alone; the fused bucket-phase kernel
(msm/bucket_pallas.py, ~56 unrolled group-formula bodies) is several
minutes.  Round 3's bench burned its whole budget re-tracing a fresh
geometry per size and never reached 2^20.

Fix, in three moves:

1. **One geometry.**  Points are processed in fixed-size chunks
   (default 2^17 points -> 2^18 table entries after GLV).  An MSM of any
   size is a sum of per-chunk partial MSMs (MSM is linear in the point
   set), so the round kernel is traced and compiled exactly once and
   reused by 2^14 and 2^20 alike.  This is also the natural multi-chip
   unit: chunks are the reference's per-thread scalar slices
   (scalar_multiplication.cpp:720-835) mapped to whole devices.

2. **Buckets accumulate across chunks.**  Each (round, chunk) produces
   2^c Jacobian bucket tails (pippenger._packed_round_buckets); they are
   converted to complete projective form and folded into per-round
   running bucket planes with one width-2^c complete add (~65 us fused).
   The expensive bucket phase then runs ONCE per MSM, batched over all
   rounds.

3. **Bucket phase = round-batched XLA composition over small fused
   kernels.**  The suffix-sum identity W = sum_{j>=1} S_j runs as
   lax.scan / Hillis-Steele scans whose bodies are the cached fused
   proj_add Pallas op — loop-rolled, so the trace cost is ONE add body —
   over planes shaped (16, rounds, 2^c): all 8 rounds ride one pass.
   The width-1 Horner fold acc = 2^c acc + W_r closes the MSM.

Everything is bit-identical to msm_engine's packed path (same kernels,
same formulas, different staging).

Reference bar: scalar_multiplication.cpp:145-167 (2^20 MSM ~ 2^24 adds).
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
SMALL_CHUNK_LOG2 = 14


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


@functools.lru_cache(maxsize=None)
def _stage_fns(curve: CurveSpec, n: int, c: int, K: int):
    """The six per-round device programs, one jit each.

    Granularity is a MEASUREMENT, not taste (r4, tunneled v5e, n=2^18):
    run as these six executables chained back-to-back the round costs
    ~4.5 ms of device time; the same math composed into ONE module runs
    21 ms/round pipelined (47 ms blocked), and fusing a whole 8-round
    chunk into one program hit both a 60x slowdown and a tunnel-client
    panic on input-output aliasing.  Small chained executables win on
    this backend: per-dispatch overhead is sub-ms when the client
    pipelines, and each module keeps the layouts XLA chose for it.

      sort1   digit extraction + 17-row variadic sort (groups by digit)
      sort2   fixed rank -> K-major relayout sort (rake reads tiles)
      rake    fused Pallas segment-scan over (K, B) tiles
      carries cross-block carries (Hillis segmented scan over B)
      tails   bucket-tail gather + carry add -> Jacobian bucket planes
      fold    j2c + complete add into the round's running planes
    """
    ops = JacobianOps(curve)
    B = n // K
    nbuckets = 1 << c
    mask_c = jnp.uint32(nbuckets - 1)

    @jax.jit
    def sort1(packed16, scalars, ri):
        limb_row = lax.dynamic_index_in_dim(
            scalars, (c * ri) // 16, axis=0, keepdims=False)
        d = (limb_row >> ((c * ri) % 16).astype(jnp.uint32)) & mask_c
        return lax.sort((d,) + tuple(packed16), num_keys=1)

    @jax.jit
    def sort2(outs):
        r_idx = jnp.arange(n, dtype=jnp.uint32)
        km = (r_idx % K) * B + r_idx // K
        return lax.sort((km,) + tuple(outs), num_keys=1)

    @jax.jit
    def rake(sdk_flat, rest):
        SPk = jnp.stack(rest, axis=0)
        dig_k = sdk_flat.reshape(K, B // 128, 128)
        pk = SPk.reshape(16, K, B // 128, 128)
        return ops.rake_scan_packed(dig_k, pk, B, K)

    @jax.jit
    def carries(sdk_flat, scan_k):
        sdk = sdk_flat.reshape(K, B)
        T = tuple(sc.reshape(16, n)[:, (K - 1) * B:] for sc in scan_k)
        internal = jnp.any(sdk[1:] != sdk[:-1], axis=0)
        return pp._block_carries_from(ops, sdk[0], sdk[K - 1], internal,
                                      T, B)

    @jax.jit
    def tails(sd, sdk_flat, scan_k, C):
        edges = jnp.searchsorted(
            sd, jnp.arange(nbuckets + 1).astype(sd.dtype))
        frk_flat = (sdk_flat.reshape(K, B)
                    == sdk_flat.reshape(K, B)[:1]).reshape(n)
        jidx = jnp.arange(nbuckets)
        count_j = edges[1:] - edges[:-1]
        valid = (count_j > 0) & (jidx > 0)
        tc = jnp.clip(edges[1:].astype(jnp.int32) - 1, 0, n - 1)
        kpos = tc % K
        bpos = tc // K
        tk = kpos * B + bpos
        g = tuple(jnp.take(sc.reshape(16, n), tk, axis=1) for sc in scan_k)
        cg = tuple(jnp.take(cc, bpos, axis=-1) for cc in C)
        frj = jnp.take(frk_flat, tk)
        carry = ops.select(frj & valid, cg, ops.infinity((nbuckets,)))
        bt = ops.add_unsafe(g, carry)
        return ops.select(valid, bt, ops.infinity((nbuckets,)))

    @jax.jit
    def fold(bacc, bj):
        return ops.c_add(bacc, ops.j2c(bj))

    def round_buckets(packed16, scalars, ri, bacc):
        outs = sort1(packed16, scalars, ri)
        outs2 = sort2(outs)
        scan_k = rake(outs2[1], tuple(outs2[2:]))
        C = carries(outs2[1], scan_k)
        bj = tails(outs[0], outs2[1], scan_k, C)
        return fold(bacc, bj)

    # expose the individual stage jits for the chip profiler
    # (tools/chip_probe.py chunked-profile) — same executables the
    # driver dispatches, so stage timings ARE production timings
    round_buckets.stages = {
        "sort1": sort1, "sort2": sort2, "rake": rake,
        "carries": carries, "tails": tails, "fold": fold,
    }
    return round_buckets


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
    def sort1(packed16, scalars):
        # digits for ALL R rounds: row r = c-bit window r of each scalar
        rows = []
        for ri in range(R):
            limb_row = scalars[(c * ri) // 16]
            rows.append((limb_row >> jnp.uint32((c * ri) % 16)) & mask_c)
        digR = jnp.stack(rows, axis=0)                      # (R, n)
        pay = tuple(jnp.broadcast_to(p, (R, n)) for p in packed16)
        return lax.sort((digR,) + pay, dimension=1, num_keys=1)

    def _kmajor(x):
        # (R, n) rank-major -> (K, R*B) K-major lanes (lane = r*B + b)
        return x.reshape(R, B, K).transpose(2, 0, 1).reshape(K, Bp)

    @jax.jit
    def rake(sdR, SPR):
        dig_k = _kmajor(sdR).reshape(K, Bp // 128, 128)
        pk = jnp.stack([_kmajor(p) for p in SPR], axis=0)
        pk = pk.reshape(16, K, Bp // 128, 128)
        scan_k = ops.rake_scan_packed(dig_k, pk, Bp, K)
        return scan_k + (dig_k.reshape(K, Bp),)

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

    @jax.jit
    def tails(sdR, sdk, scan_k, C):
        # per-round bucket edges: edges[r, j] = #digits_r < j
        q = jnp.arange(nbuckets + 1).astype(sdR.dtype)
        edges = jax.vmap(lambda s: jnp.searchsorted(s, q))(sdR)  # (R, nb+1)
        jidx = jnp.arange(nbuckets)[None]
        count_j = edges[:, 1:] - edges[:, :-1]
        valid = (count_j > 0) & (jidx > 0)                  # (R, nb)
        tc = jnp.clip(edges[:, 1:].astype(jnp.int32) - 1, 0, n - 1)
        kk = tc % K                                          # serial step
        lane = jnp.arange(R, dtype=jnp.int32)[:, None] * B + tc // K
        col = (kk * Bp + lane).reshape(R * nbuckets)
        g = tuple(jnp.take(sc.reshape(16, K * Bp), col, axis=1)
                  .reshape(16, R, nbuckets) for sc in scan_k)
        cg = tuple(jnp.take(cc, lane.reshape(-1), axis=-1)
                   .reshape(cc.shape[:-1] + (R, nbuckets)) for cc in C)
        frk = (sdk == sdk[:1]).reshape(K * Bp)
        frj = jnp.take(frk, col).reshape(R, nbuckets)
        carry = ops.select(frj & valid, cg,
                           ops.infinity((R, nbuckets)))
        bt = ops.add_unsafe(g, carry)
        return ops.select(valid, bt, ops.infinity((R, nbuckets)))

    @jax.jit
    def fold(bacc, bj):
        return ops.c_add(bacc, ops.j2c(bj))

    def chunk_buckets(packed16, scalars, bacc):
        """ONE chunk, ALL rounds: 5 chained dispatches."""
        outs = sort1(packed16, scalars)
        rk = rake(outs[0], tuple(outs[1:]))
        scan_k, sdk = rk[:3], rk[3]
        C = carries(sdk, scan_k)
        bj = tails(outs[0], sdk, scan_k, C)
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

    S = ops.c_add(local, tuple(cc[..., None] for cc in carry))
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
