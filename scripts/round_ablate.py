"""Ablation timing of one MSM round body at bench shapes (n=2^21, c=16).

Builds variants of the round body with phases removed, times each with
dependency-chained iterations (same-args loops are memoized by the axon
tunnel), and reports the implied per-phase cost.  This is the only
trustworthy way to attribute time inside the fused jit — standalone phase
jits measure differently than the composed pipeline.

    python scripts/round_ablate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aztec_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aztec_tpu.curves.spec import BN254_G1  # noqa: E402
from aztec_tpu.curves.group_ops import JacobianOps  # noqa: E402
from aztec_tpu.msm import pippenger  # noqa: E402

N_LOG2 = 21
C_BITS = 16
K = 64
K2 = 64

n = 1 << N_LOG2
nbuckets = 1 << C_BITS
B = n // K
ops = JacobianOps(BN254_G1)


def chain(label, f, x0, iters=3):
    """block_until_ready alone can return early on the tunnel backend for
    some graphs (observed round 3) — a host pull of one scalar per
    iteration is the only sync that cannot lie."""
    t0 = time.time()
    x = f(x0)
    _ = np.asarray(x[4][0])  # acc depends on the whole pipeline
    comp = time.time() - t0
    t0 = time.time()
    for _i in range(iters):
        x = f(x)
        _ = np.asarray(x[4][0])  # forced host sync via acc
    dt = (time.time() - t0) / iters
    print(f"{label:28s} {dt*1e3:9.2f} ms  (compile {comp:.0f}s)", flush=True)
    return dt


def round_variant(parts):
    """parts: set of {'sort','gather','rake','tails','bucket','dbl'}"""

    def body(state):
        cnt, d, X, Y, acc = state
        PT = jnp.concatenate([X, Y], axis=0).T

        if "dbl" in parts:
            acc = ops.c_dbl_n(acc, C_BITS)

        if "sort" in parts:
            perm = jnp.argsort(d)
        else:
            perm = jnp.arange(n)
        sd = jnp.take(d, perm)
        if "gather" in parts:
            SPt = jnp.take(PT, perm, axis=0).T
            sx, sy = SPt[:16], SPt[16:]
        else:
            sx, sy = X, Y

        if "rake" in parts:
            scan, C, fr, sdb = pippenger._rake_segment_scan(
                ops, sd, (sx, sy), B, K)
        else:
            scan = tuple(p.reshape(16, B, K) for p in (sx, sy, sy))
            C = ops.infinity((B,))
            fr = jnp.zeros((B, K), bool).at[:, 0].set(True)
            sdb = sd.reshape(B, K)

        if "tails" in parts:
            edges = jnp.searchsorted(
                sd, jnp.arange(nbuckets + 1).astype(sd.dtype))
            jidx = jnp.arange(nbuckets)
            count_j = edges[1:] - edges[:-1]
            valid = (count_j > 0) & (jidx > 0)
            tc = jnp.clip(edges[1:].astype(jnp.int32) - 1, 0, n - 1)
            svals = [s.reshape((-1, n)) for s in scan]
            SV = jnp.concatenate(svals, axis=0)
            SR = jnp.take(SV.T, tc, axis=0).T
            g, ofs = [], 0
            for s, v in zip(scan, svals):
                g.append(SR[ofs:ofs + v.shape[0]].reshape(
                    s.shape[:-2] + (nbuckets,)))
                ofs += v.shape[0]
            g = tuple(g)
            fr_flat = fr.reshape(n)
            frj = jnp.take(fr_flat, tc)
            blk = (tc // K).astype(jnp.int32)
            cvals = [cc.reshape((-1, B)) for cc in C]
            CR = jnp.concatenate(cvals, axis=0)
            CB = jnp.take(CR.T, blk, axis=0).T
            cg, ofs = [], 0
            for cc, v in zip(C, cvals):
                cg.append(CB[ofs:ofs + v.shape[0]].reshape(
                    cc.shape[:-1] + (nbuckets,)))
                ofs += v.shape[0]
            carry = ops.select(frj & valid, tuple(cg),
                               ops.infinity((nbuckets,)))
            bt = ops.add_unsafe(g, carry)
            buckets = ops.select(valid, bt, ops.infinity((nbuckets,)))
        else:
            buckets = tuple(
                s[..., :nbuckets // K, :].reshape(s.shape[:-2] + (nbuckets,))
                for s in scan)

        if "bucket" in parts:
            W = pippenger._bucket_phase(ops, ops.j2c(buckets), nbuckets, K2)
            acc = ops.c_add(acc, W)
        else:
            acc = ops.c_add(acc, tuple(b[..., :1] for b in ops.j2c(buckets)))

        # chain: next digits derive from acc AND a strictly-increasing
        # counter, so no two iterations ever see identical inputs (the
        # tunnel memoizes identical (executable, args) pairs, and a
        # data-dependent bit alone can be 0 or cycle with period 2)
        d2 = (d + cnt + (acc[0][0, 0] & jnp.uint32(1))) & jnp.uint32(
            nbuckets - 1)
        return cnt + jnp.uint32(1), d2, X, Y, acc

    return jax.jit(body)


def main():
    rng = np.random.default_rng(7)
    d = jnp.asarray(rng.integers(0, nbuckets, (n,), dtype=np.uint32))
    X = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
    Y = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
    acc = ops.c_infinity((1,))
    state = (jnp.uint32(1), d, X, Y, acc)
    print(f"backend={jax.devices()[0]} n=2^{N_LOG2}", flush=True)

    FULL = {"sort", "gather", "rake", "tails", "bucket", "dbl"}
    t_full = chain("FULL round", round_variant(frozenset(FULL)), state)
    for drop in ("sort", "gather", "rake", "tails", "bucket", "dbl"):
        t = chain(f"minus {drop}",
                  round_variant(frozenset(FULL - {drop})), state)
        print(f"    -> {drop} contributes {max(t_full - t, 0)*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
