#!/usr/bin/env python
"""Consolidated live-chip probe (VERDICT r4 #8: one tool, subcommands).

Replaces the round-4 scratch scripts (tunnel_probe*, msm_dissect*,
msm_time, time_msm20, staged_check).  Subcommands:

  chunked-profile [log2n]   per-stage breakdown of the chunked MSM
  dispatch                  tunnel dispatch/sync latency
  micro / batch-test / dep-test / gather-test / tails-test
                            dispatch+lowering forensics (r5 findings)
  fft [sizes...]            Stockham fft/ifft/coset timings
  help

All timings are wall-clock with explicit block_until_ready barriers; the
tunneled backend memoizes identical (executable, args) executions, so
every repeated measurement varies an argument (round index, tweaked
limb) to force real work.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aztec_tpu.utils import setup_compile_cache
setup_compile_cache()

import numpy as np


def _bench_points(log2n):
    d = np.load(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache", "points_2pow20.npz"))
    n = 1 << log2n
    return d["X"][:, :n].astype(np.uint32), d["Y"][:, :n].astype(np.uint32)


def _scalars(log2n, seed=7):
    from aztec_tpu.ff.bn254 import FR_MOD
    from aztec_tpu.numeric.bigint import ints_to_limbs

    rng = np.random.default_rng(seed)
    ints = [int.from_bytes(rng.bytes(32), "little") % FR_MOD
            for _ in range(1 << log2n)]
    return ints, ints_to_limbs(ints)


def cmd_chunked_profile(argv):
    log2n = int(argv[0]) if argv else 20
    import jax
    import jax.numpy as jnp
    from aztec_tpu.curves.spec import BN254_G1
    from aztec_tpu.curves.group_ops import JacobianOps
    from aztec_tpu.msm import chunked

    print(f"backend: {jax.default_backend()}", flush=True)
    Xh, Yh = _bench_points(log2n)
    _, sl = _scalars(log2n)
    X, Y = jnp.asarray(Xh), jnp.asarray(Yh)
    scalars = jnp.asarray(sl)
    n = 1 << log2n
    curve = BN254_G1
    chunk = 1 << chunked.CHUNK_LOG2
    rounds = 8
    n_eff, _ = chunked._chunk_geometry(chunked.CHUNK_LOG2, True, chunked.RAKE_K)
    nbuckets = 1 << 16
    ops = JacobianOps(curve)

    prep = chunked._prep_fn(curve, True)
    rb = chunked._stage_fns_batched(curve, n_eff, 16, chunked.RAKE_K,
                                    rounds)
    finish = chunked._finish_fn(curve, rounds, 16, nbuckets, True)

    # ---- full pipelined wall (the production number) ----
    r = chunked.msm_chunked((X, Y), scalars, curve)
    r[0].block_until_ready()   # warm
    t0 = time.perf_counter()
    sc2 = jnp.roll(scalars, 1, axis=1)
    r = chunked.msm_chunked((X, Y), sc2, curve)
    r[0].block_until_ready()
    wall = time.perf_counter() - t0
    print(f"pipelined full MSM wall: {wall*1e3:.1f} ms "
          f"({n/wall:.3e} pts/s)", flush=True)

    # ---- per-stage serialized walls (batched rounds), per chunk ----
    nchunks = max(1, n // chunk)
    stage_t = {k: [] for k in
               ("prep",) + tuple(rb.stages) + ("finish",)}
    acc = tuple(jnp.asarray(a)
                for a in ops.c_infinity((rounds, nbuckets)))
    for ci in range(nchunks):
        base = ci * chunk
        t0 = time.perf_counter()
        packed16, sc = prep(X[:, base:base + chunk], Y[:, base:base + chunk],
                            sc2[:, base:base + chunk])
        jax.block_until_ready(packed16)
        stage_t["prep"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        sdR, idxR = rb.stages["sort1"](sc)
        jax.block_until_ready(sdR)
        stage_t["sort1"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        rk = rb.stages["rake"](sdR, idxR, packed16)
        jax.block_until_ready(rk)
        stage_t["rake"].append(time.perf_counter() - t0)
        scan_k, sdk = rk[:3], rk[3]

        t0 = time.perf_counter()
        C = rb.stages["carries"](sdk, scan_k)
        jax.block_until_ready(C)
        stage_t["carries"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        bj = rb.stages["tails"](sdR, sdk, scan_k, C)
        jax.block_until_ready(bj)
        stage_t["tails"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        acc = rb.stages["fold"](acc, bj)
        jax.block_until_ready(acc)
        stage_t["fold"].append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    out = finish(*acc)
    jax.block_until_ready(out)
    stage_t["finish"].append(time.perf_counter() - t0)

    total = 0.0
    print(f"\nper-stage serialized walls (n=2^{log2n}, {nchunks} chunks, "
          f"rounds batched):")
    for k, ts in stage_t.items():
        ts = np.array(ts)
        tot = ts.sum()
        total += tot
        print(f"  {k:8s}  calls={len(ts):3d}  mean={ts.mean()*1e3:7.2f} ms  "
              f"min={ts.min()*1e3:7.2f}  total={tot*1e3:8.1f} ms")
    print(f"  {'SUM':8s}  {'':22s}  total={total*1e3:8.1f} ms  "
          f"(pipelined wall was {wall*1e3:.1f} ms)")
    return 0


def cmd_dispatch(argv):
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((8, 128), jnp.uint32)
    f = jax.jit(lambda a: a + 1)
    f(x).block_until_ready()
    N = 200
    t0 = time.perf_counter()
    y = x
    for _ in range(N):
        y = f(y)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / N
    print(f"chained tiny-op dispatch: {dt*1e6:.1f} us/op (N={N})")

    t0 = time.perf_counter()
    for _ in range(N):
        f(x).block_until_ready()
    dt = (time.perf_counter() - t0) / N
    print(f"blocking round-trip:      {dt*1e6:.1f} us/op (N={N})")
    return 0


def cmd_fft(argv):
    """Stockham fft/ifft/coset timings on the chip (VERDICT r4 #5).
    Sizes default to the prover's real domains at 2^20 gates: n and 4n."""
    sizes = [int(a) for a in argv] or [20, 22]
    import jax
    import jax.numpy as jnp
    from aztec_tpu.poly import fft_ops as fftmod
    from aztec_tpu.poly.domain import EvaluationDomain
    from aztec_tpu.ff import FR, limb
    from aztec_tpu.ff.bn254 import FR_MOD
    from aztec_tpu.numeric.bigint import ints_to_limbs

    print(f"backend: {jax.default_backend()}", flush=True)
    results = {}
    rng = np.random.default_rng(3)
    for log2n in sizes:
        n = 1 << log2n
        dom = EvaluationDomain(n)
        # build the root/coset tables EAGERLY (outside any jit trace)
        jax.block_until_ready((dom.forward_roots, dom.inverse_roots,
                               dom.coset_powers(),
                               dom.coset_inverse_powers()))
        vals = rng.integers(1, 1 << 62, size=n)
        raw = jnp.asarray(ints_to_limbs([int(v) % FR_MOD for v in vals]))
        # to_mont via the fused kernel: the eager limb path materializes
        # the (L, L, n) outer product (4+ GB at 2^22 -> OOM)
        from aztec_tpu.poly.fft import _mul as fmul
        r2 = jnp.broadcast_to(
            jnp.asarray(np.array(FR.r2_limbs, np.uint32))[:, None], (16, n))
        a = fmul(raw, r2)

        # correctness gate: ifft(fft(a)) == a and coset roundtrip
        rt = fftmod.ifft(fftmod.fft(a, dom), dom)
        assert np.array_equal(np.asarray(rt), np.asarray(a)), \
            f"fft/ifft roundtrip FAILED at 2^{log2n}"
        crt = fftmod.coset_ifft(fftmod.coset_fft(a, dom), dom)
        assert np.array_equal(np.asarray(crt), np.asarray(a)), \
            f"coset roundtrip FAILED at 2^{log2n}"
        print(f"2^{log2n} fft/ifft + coset roundtrips OK", flush=True)
        # no outer jit: the inner stages are jitted with the root tables
        # as ARGUMENTS; an outer jit would capture the 268 MB coset table
        # as a graph constant and blow the tunnel's compile-RPC limit
        for name, g in (
            ("fft", lambda v, d=dom: fftmod.fft(v, d)),
            ("ifft", lambda v, d=dom: fftmod.ifft(v, d)),
            ("coset_fft", lambda v, d=dom: fftmod.coset_fft(v, d)),
        ):
            r = g(a)
            jax.block_until_ready(r)
            iters = 4
            t0 = time.perf_counter()
            v = a
            for it in range(iters):
                # dependency-chain: next input derives from the previous
                # OUTPUT (reduced mod 2^16 per limb keeps planes valid)
                v = r & jnp.uint32(0xFFFF)
                r = g(v)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / iters
            results[f"{name}_2pow{log2n}_ms"] = round(dt * 1e3, 2)
            # bytes: log2(n) stages x read+write of the (16, n) u32 array
            gbs = 2 * 16 * 4 * n * log2n / dt / 1e9
            print(f"{name:10s} n=2^{log2n}: {dt*1e3:8.2f} ms  "
                  f"(~{gbs:.0f} GB/s streamed)", flush=True)
    print(json.dumps(results))
    return 0


def cmd_micro(argv):
    """Constituent-op costs at the chunk geometry: pinpoints where the
    stage milliseconds go (arg overhead vs gathers vs fused kernels)."""
    iters = int(argv[0]) if argv else 24
    import jax
    import jax.numpy as jnp
    from aztec_tpu.curves.spec import BN254_G1
    from aztec_tpu.curves.group_ops import JacobianOps

    print(f"backend: {jax.default_backend()}", flush=True)
    ops = JacobianOps(BN254_G1)
    n = 1 << 18
    nb = 1 << 16
    rng = np.random.default_rng(5)

    def arr(shape):
        return jnp.asarray(
            rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))

    P = tuple(arr((16, nb)) for _ in range(3))
    Q = tuple(arr((16, nb)) for _ in range(3))
    S = tuple(arr((16, n)) for _ in range(3))
    idx = jnp.asarray(rng.integers(0, n, size=(nb,), dtype=np.int32))
    keys = arr((n,))
    payload = tuple(arr((n,)) for _ in range(17))

    @jax.jit
    def tw(a, i):
        return a.at[0, i].set(a[0, i] ^ jnp.uint32(1))

    def chain(name, fn):
        jax.block_until_ready(fn(0))
        t0 = time.perf_counter()
        r = None
        for it in range(iters):
            r = fn(it)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name:24s} {dt*1e3:8.3f} ms/call", flush=True)
        return dt

    ident = jax.jit(lambda *a: a[0][0, :1])
    chain("identity(6x12MB args)", lambda it: ident(*(tw(a, jnp.int32(it))
                                                      for a in P + Q)))
    cadd = jax.jit(ops.c_add)
    chain("c_add w=65536", lambda it: cadd(
        tuple(tw(a, jnp.int32(it)) for a in P), Q))
    j2c = jax.jit(ops.j2c)
    chain("j2c w=65536", lambda it: j2c(
        tuple(tw(a, jnp.int32(it)) for a in P)))
    addu = jax.jit(ops.add_unsafe)
    chain("add_unsafe w=65536", lambda it: addu(
        tuple(tw(a, jnp.int32(it)) for a in P), Q))
    g3 = jax.jit(lambda s, ix: tuple(jnp.take(a, ix, axis=1) for a in s))
    chain("3x gather 65k from 2^18", lambda it: g3(
        tuple(tw(a, jnp.int32(it)) for a in S), idx))
    from jax import lax as _lax

    srt = jax.jit(lambda *a: _lax.sort(a, num_keys=1))
    chain("sort 17x2^18", lambda it: srt(
        tw(keys[None], jnp.int32(it))[0], *payload))
    ss = jax.jit(lambda k: jnp.searchsorted(
        k, jnp.arange(nb + 1).astype(k.dtype)))
    chain("searchsorted 65k/2^18", lambda it: ss(
        tw(keys[None], jnp.int32(it))[0]))
    return 0


def cmd_batch_test(argv):
    """Validate round-batching: 8 separate stage-sized dispatches vs ONE
    batched dispatch doing 8x the work.  If the wall gap is large, the
    per-dispatch overhead (not device time) dominates the MSM."""
    iters = int(argv[0]) if argv else 12
    import jax
    import jax.numpy as jnp
    from jax import lax
    from aztec_tpu.curves.spec import BN254_G1
    from aztec_tpu.curves.group_ops import JacobianOps

    print(f"backend: {jax.default_backend()}", flush=True)
    ops = JacobianOps(BN254_G1)
    n = 1 << 18
    nb = 1 << 16
    R = 8
    rng = np.random.default_rng(5)

    def arr(shape):
        return jnp.asarray(
            rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))

    keys1 = arr((n,))
    pay1 = tuple(arr((n,)) for _ in range(17))
    keysR = arr((R, n))
    payR = tuple(arr((R, n)) for _ in range(17))

    srt1 = jax.jit(lambda k, *p: lax.sort((k,) + p, num_keys=1))
    srtR = jax.jit(lambda k, *p: lax.sort(
        (k,) + p, dimension=1, num_keys=1))

    # freshness rides a device-side counter: no host->device transfers,
    # every call sees a value the backend has never memoized
    @jax.jit
    def tw(a, s):
        return a.at[..., 0].set(a[..., 0] ^ (s + jnp.uint32(1)))

    @jax.jit
    def bump(s):
        return s + jnp.uint32(0x9E3779B9)

    def chain(name, fn, per):
        s = jnp.uint32(1)
        jax.block_until_ready(fn(s))
        s = bump(s)
        t0 = time.perf_counter()
        r = None
        for it in range(iters):
            r = fn(s)
            s = bump(s)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name:28s} {dt*1e3:8.2f} ms/iter "
              f"({dt/per*1e3:.2f} ms per round-equiv)", flush=True)

    def sep_sorts(s):
        r = None
        for k in range(R):
            r = srt1(tw(keys1, s + jnp.uint32(k)), *pay1)
        return r

    chain("sort17 x8 separate", sep_sorts, R)
    chain("sort17 x1 batched(8,n)", lambda s: srtR(tw(keysR, s), *payR), R)

    P1 = tuple(arr((16, nb)) for _ in range(3))
    Q1 = tuple(arr((16, nb)) for _ in range(3))
    PR = tuple(arr((16, R, nb)) for _ in range(3))
    QR = tuple(arr((16, R, nb)) for _ in range(3))
    cadd = jax.jit(ops.c_add)

    def sep_adds(s):
        r = None
        for k in range(R):
            r = cadd(tuple(tw(a, s + jnp.uint32(k)) for a in P1), Q1)
        return r

    chain("c_add x8 separate", sep_adds, R)
    chain("c_add x1 batched", lambda s: cadd(
        tuple(tw(a, s) for a in PR), QR), R)

    # scalar host->device transfer cost (the jnp.int32(ri) pattern)
    f = jax.jit(lambda a, i: a + i)
    x = jnp.zeros((8, 128), jnp.uint32)
    jax.block_until_ready(f(x, jnp.uint32(7)))
    t0 = time.perf_counter()
    y = x
    for it in range(50):
        y = f(y, jnp.uint32(1000 + it))
    jax.block_until_ready(y)
    print(f"  tiny-op + fresh host scalar: "
          f"{(time.perf_counter()-t0)/50*1e3:.3f} ms/call", flush=True)
    return 0


def cmd_dep_test(argv):
    """Dependent vs independent execution chains: detects a backend that
    defers or elides work whose results are never consumed (which would
    poison every unchained measurement)."""
    iters = int(argv[0]) if argv else 24
    import jax
    import jax.numpy as jnp
    from jax import lax
    from aztec_tpu.curves.spec import BN254_G1
    from aztec_tpu.curves.group_ops import JacobianOps

    print(f"backend: {jax.default_backend()}", flush=True)
    ops = JacobianOps(BN254_G1)
    nb = 1 << 16
    n = 1 << 18
    rng = np.random.default_rng(5)

    def arr(shape):
        return jnp.asarray(
            rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))

    P = tuple(arr((16, nb)) for _ in range(3))
    Q = tuple(arr((16, nb)) for _ in range(3))
    cadd = jax.jit(ops.c_add)
    jax.block_until_ready(cadd(P, Q))

    # dependent: every call consumes the previous result
    t0 = time.perf_counter()
    R = P
    for _ in range(iters):
        R = cadd(R, Q)
    jax.block_until_ready(R)
    print(f"  c_add dependent   {(time.perf_counter()-t0)/iters*1e3:8.3f}"
          f" ms/call", flush=True)

    # independent: results unused except the last
    @jax.jit
    def tw(a, s):
        return a.at[..., 0].set(a[..., 0] ^ (s + jnp.uint32(1)))

    s = jnp.uint32(3)
    t0 = time.perf_counter()
    r = None
    for it in range(iters):
        s = s + jnp.uint32(1)
        r = cadd(tuple(tw(a, s) for a in P), Q)
    jax.block_until_ready(r)
    print(f"  c_add independent {(time.perf_counter()-t0)/iters*1e3:8.3f}"
          f" ms/call", flush=True)

    # dependent batched sort: outputs feed the next call's inputs
    R8 = 8
    keysR = arr((R8, n))
    payR = tuple(arr((R8, n)) for _ in range(17))
    srtR = jax.jit(lambda k, *p: lax.sort((k,) + p, dimension=1,
                                          num_keys=1))
    jax.block_until_ready(srtR(keysR, *payR))
    t0 = time.perf_counter()
    k, p = keysR, payR
    for it in range(iters):
        out = srtR(k, *p)
        k = out[1] ^ jnp.uint32(1)   # consume outputs -> forces execution
        p = out[2:] + (out[0],)
    jax.block_until_ready(k)
    print(f"  sortR dependent   {(time.perf_counter()-t0)/iters*1e3:8.3f}"
          f" ms/call", flush=True)
    return 0


def cmd_tails_test(argv):
    """tails-stage subcomponents at production shapes."""
    iters = int(argv[0]) if argv else 12
    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(5)
    R, n, nb = 8, 1 << 18, 1 << 16
    N = 1 << 21
    Bp = 1 << 15
    sdR = jnp.asarray(np.sort(rng.integers(0, nb, size=(R, n),
                                           dtype=np.uint32), axis=1))
    SV3 = tuple(jnp.asarray(rng.integers(0, 1 << 16, size=(16, N),
                                         dtype=np.uint32))
                for _ in range(3))
    frk = jnp.asarray(rng.integers(0, 2, size=(N,), dtype=np.uint32))
    CV = jnp.asarray(rng.integers(0, 1 << 16, size=(48, Bp),
                                  dtype=np.uint32))
    lane = jnp.asarray(rng.integers(0, Bp, size=(R * nb,), dtype=np.int32))

    @jax.jit
    def tw(a, s):
        return a.at[..., 0].set(a[..., 0] ^ (s + jnp.uint32(1)))

    def chain(name, fn):
        s = jnp.uint32(1)
        r = fn(s)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for it in range(iters):
            r = fn(s)
            s = (jnp.ravel(r[0] if isinstance(r, tuple) else r)[0]
                 & jnp.uint32(0xFF)) + jnp.uint32(it)
        jax.block_until_ready(r)
        print(f"  {name:30s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms",
              flush=True)

    q = jnp.arange(nb + 1).astype(jnp.uint32)
    f_ss = jax.jit(lambda sd: jax.vmap(
        lambda s: jnp.searchsorted(s, q))(sd))
    chain("vmap searchsorted scan", lambda s: f_ss(tw(sdR, s)))

    f_ss2 = jax.jit(lambda sd: jax.vmap(
        lambda s: jnp.searchsorted(s, q, method='sort'))(sd))
    chain("vmap searchsorted sort", lambda s: f_ss2(tw(sdR, s)))

    f_cat = jax.jit(lambda a, b, c, f: jnp.concatenate(
        [a, b, c, f[None]], axis=0).T)
    chain("SV concat + .T (49,2^21)", lambda s: f_cat(
        tw(SV3[0], s), SV3[1], SV3[2], frk))

    f_cv = jax.jit(lambda cv, ix: jnp.take(cv.T, ix, axis=0).T)
    chain("CV row take 524k of 32k", lambda s: f_cv(tw(CV, s), lane))
    return 0


def cmd_gather2_test(argv):
    """Rake point-gather and carry-gather orientations at EXACT
    production shapes (M=2^21 rows of a (16, 2^18) table; M=2^19 rows of
    a (48, 2^15) table)."""
    iters = int(argv[0]) if argv else 10
    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(5)

    @jax.jit
    def tw(a, s):
        return a.at[..., 0].set(a[..., 0] ^ (s + jnp.uint32(1)))

    def chain(name, fn):
        s = jnp.uint32(1)
        r = fn(s)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for it in range(iters):
            r = fn(s)
            s = (jnp.ravel(r)[0] & jnp.uint32(0xFF)) + jnp.uint32(it)
        jax.block_until_ready(r)
        print(f"  {name:34s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms",
              flush=True)

    for (C, N, M, label) in ((16, 1 << 18, 1 << 21, "rake"),
                             (48, 1 << 15, 1 << 19, "carry")):
        T = jnp.asarray(rng.integers(0, 1 << 16, size=(C, N),
                                     dtype=np.uint32))
        TM = jnp.asarray(np.ascontiguousarray(np.asarray(T).T))  # (N, C)
        col = jnp.asarray(rng.integers(0, N, size=(M,), dtype=np.int32))

        f1 = jax.jit(lambda t, ix: jnp.take(t.T, ix, axis=0).T)
        chain(f"{label}: take(T.T,ix).T fused", lambda s: f1(tw(T, s), col))
        f2 = jax.jit(lambda tm, ix: jnp.take(tm, ix, axis=0).T)
        chain(f"{label}: take(TM,ix).T premat", lambda s: f2(tw(TM, s), col))
        f3 = jax.jit(lambda t, ix: jnp.take(t, ix, axis=1))
        chain(f"{label}: minor take", lambda s: f3(tw(T, s), col))
        f4 = jax.jit(lambda t, ix: jnp.take(
            lax.optimization_barrier(t.T), ix, axis=0).T)
        chain(f"{label}: take(bar(T.T),ix).T", lambda s: f4(tw(T, s), col))
    return 0


def cmd_gather_test(argv):
    """Tail-gather strategies at the production tails shapes: which
    lowering actually runs at bandwidth on this backend."""
    iters = int(argv[0]) if argv else 12
    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(5)
    for N in (1 << 21, 1 << 18):
        C = 49
        M = 1 << 19          # gathered rows (R * nbuckets)
        SV = jnp.asarray(rng.integers(0, 1 << 16, size=(C, N),
                                      dtype=np.uint32))
        col = jnp.asarray(rng.integers(0, N, size=(M,), dtype=np.int32))

        @jax.jit
        def tw(a, s):
            return a.at[0].set(a[0] ^ (s + jnp.uint32(1)))

        def chain(name, fn):
            s = jnp.uint32(1)
            jax.block_until_ready(fn(s))
            t0 = time.perf_counter()
            r = None
            for it in range(iters):
                r = fn(s)
                s = (r[0].reshape(-1)[0] & jnp.uint32(0xFF)) + jnp.uint32(it)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / iters
            print(f"  N=2^{int(np.log2(N))} {name:26s} {dt*1e3:8.2f} ms",
                  flush=True)

        f_minor = jax.jit(lambda sv, ix: jnp.take(sv, ix, axis=1))
        chain("minor-axis take (49 rows)", lambda s: f_minor(tw(SV, s), col))

        f_rows = jax.jit(lambda sv, ix: jnp.take(sv.T, ix, axis=0).T)
        chain("take(SV.T).T fused", lambda s: f_rows(tw(SV, s), col))

        def rows_bar(sv, ix):
            svt = lax.optimization_barrier(sv.T)
            return jnp.take(svt, ix, axis=0).T

        f_bar = jax.jit(rows_bar)
        chain("take(barrier(SV.T)).T", lambda s: f_bar(tw(SV, s), col))

        def rows_nob(sv, ix):
            svt = lax.optimization_barrier(sv.T)
            return jnp.take(svt, ix, axis=0)      # stay row-major out
        f_nob = jax.jit(rows_nob)
        chain("take(barrier(SV.T)) rowout", lambda s: f_nob(tw(SV, s), col))
    return 0


CMDS = {
    "chunked-profile": cmd_chunked_profile,
    "dispatch": cmd_dispatch,
    "micro": cmd_micro,
    "batch-test": cmd_batch_test,
    "dep-test": cmd_dep_test,
    "gather-test": cmd_gather_test,
    "gather2-test": cmd_gather2_test,
    "tails-test": cmd_tails_test,
    "fft": cmd_fft,
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in CMDS:
        print(__doc__)
        return 1
    return CMDS[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main())
