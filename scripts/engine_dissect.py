"""Round-body dissection mirroring msm_engine's CURRENT code exactly.

scripts/msm_dissect.py times the classic phases (sort/rake/bucket); this
script times every piece of the round body as the engine actually composes
them — including the tail-extraction/scatter block and the cross-block
carry fixup, which the classic split misses.  High iteration counts: the
axon tunnel adds ~5-25 ms of sync latency per block_until_ready, which
poisons low-iter measurements (observed round 3).

    python scripts/engine_dissect.py [--log2n 20]
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

C_BITS = 16
K = 64
K2 = 64


def timed(label, fn, *args, iters=20):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    print(f"{label:40s} {dt*1e3:9.2f} ms  (compile {comp:.0f}s)", flush=True)
    return dt


def main():
    log2n = 21
    if "--log2n" in sys.argv:
        log2n = int(sys.argv[sys.argv.index("--log2n") + 1])
    n = 1 << log2n  # post-GLV table width
    nbuckets = 1 << C_BITS
    B = n // K
    ops = JacobianOps(BN254_G1)
    rng = np.random.default_rng(7)

    X = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
    Y = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
    d = jnp.asarray(rng.integers(0, nbuckets, (n,), dtype=np.uint32))
    pts = (X, Y)
    print(f"backend={jax.devices()[0]} n=2^{log2n} c={C_BITS} K={K}",
          flush=True)

    # piece 1: digits -> argsort -> row-major gather (engine's gather_points)
    PT = jnp.concatenate([p.reshape(-1, n) for p in pts], axis=0).T

    @jax.jit
    def sortgather(d, PT):
        perm = jnp.argsort(d)
        sd = jnp.take(d, perm)
        SPt = jnp.take(PT, perm, axis=0).T
        return sd, SPt[:16], SPt[16:]

    timed("sort+row-gather", sortgather, d, PT)
    sd, sx, sy = jax.block_until_ready(sortgather(d, PT))

    # piece 2: rake segment scan (as engine)
    @jax.jit
    def rake(sd, sx, sy):
        return pippenger._rake_segment_scan(ops, sd, (sx, sy), B, K)

    timed("rake scan (fori, pallas adds)", rake, sd, sx, sy)
    scan, C, fr, sdb = jax.block_until_ready(rake(sd, sx, sy))

    # piece 3: tail extraction + scatters (engine code verbatim)
    @jax.jit
    def tails(scan, C, fr, sdb, sd):
        tail = jnp.concatenate([sd[1:] != sd[:-1], jnp.array([True])])
        tailb = tail.reshape(B, K)
        vals_flat = tuple(s.reshape(s.shape[:-2] + (n,)) for s in scan)
        fr_flat = fr.reshape(n)
        idx_a = jnp.where(tail & ~fr_flat & (sd > 0), sd, nbuckets)
        buckets = ops.infinity((nbuckets,))
        buckets = tuple(
            b.at[..., idx_a].set(v, mode="drop")
            for b, v in zip(buckets, vals_flat)
        )
        count = jnp.sum(fr, axis=1)
        kstar = count - 1
        bidx = jnp.arange(B)
        first_tail_val = tuple(s[..., bidx, kstar] for s in scan)
        corrected = ops.add_unsafe(first_tail_val, C)
        h = sdb[:, 0]
        is_tail_b = tailb[bidx, kstar]
        idx_b = jnp.where(is_tail_b & (h > 0), h, nbuckets)
        buckets = tuple(
            b.at[..., idx_b].set(v, mode="drop")
            for b, v in zip(buckets, corrected)
        )
        return buckets

    timed("tails+2 scatters", tails, scan, C, fr, sdb, sd)
    buckets = jax.block_until_ready(tails(scan, C, fr, sdb, sd))

    # piece 3b: the first_tail_val gather alone (minor-axis suspect)
    @jax.jit
    def ftv(scan, sdb):
        count = jnp.sum(sdb[:, 1:] != sdb[:, :-1], axis=1)
        kstar = count
        bidx = jnp.arange(B)
        return tuple(s[..., bidx, kstar] for s in scan)

    timed("  first_tail_val gather only", ftv, scan, sdb)

    # piece 4: j2c + bucket phase
    @jax.jit
    def bucket(buckets):
        return pippenger._bucket_phase(ops, ops.j2c(buckets), nbuckets, K2)

    timed("j2c + bucket phase", bucket, buckets)

    # piece 5: c doublings fused
    acc = ops.c_infinity((1,))

    @jax.jit
    def dbl(a):
        return ops.c_dbl_n(a, C_BITS)

    timed("c_dbl_n(16) width 1", dbl, acc)

    # piece 6: the hillis cross-block fixup alone
    T = tuple(s[..., K - 1] for s in scan)
    flag = jnp.asarray(rng.integers(0, 2, (B,), dtype=np.uint32) > 0)

    @jax.jit
    def hillis(T, flag):
        return pippenger._hillis_seg_scan(ops, T, flag)

    timed("hillis seg scan (width B)", hillis, T, flag)


if __name__ == "__main__":
    main()
