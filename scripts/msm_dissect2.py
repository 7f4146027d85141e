"""Phase dissection of the REAL packed MSM round (round-3 engine).

msm_dissect.py times the generic-path composition; this times the exact
stages of msm/pippenger.py round_body at bench shapes (2^20 GLV, c=16,
K=64, B=32768) each in its own jit:

  argsort | permk transpose | 17-row gather | fused rake kernel |
  block carries | tails(searchsorted+gathers) | fused bucket kernel |
  c_dbl_n | glv_table

    python scripts/msm_dissect2.py [--log2n 20]
"""

import functools
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
from aztec_tpu.msm import pippenger, glv, bucket_pallas  # noqa: E402
from aztec_tpu.numeric.bigint import ints_to_limbs  # noqa: E402
from aztec_tpu.ff.bn254 import FR_MOD  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed(label, fn, iters=4):
    try:
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r)
        comp = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:36s} {dt*1e3:9.2f} ms  (compile {comp:.0f}s)",
              flush=True)
        return dt
    except Exception as e:
        print(f"{label:36s} FAILED {e!r}", flush=True)
        return None


def main():
    log2n = 20
    if "--log2n" in sys.argv:
        log2n = int(sys.argv[sys.argv.index("--log2n") + 1])
    n = 1 << log2n
    c, K = 16, 64

    cache = os.path.join(REPO, ".bench_cache", f"points_2pow{log2n}.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        X = jnp.asarray(d["X"][:, :n].astype(np.uint32))
        Y = jnp.asarray(d["Y"][:, :n].astype(np.uint32))
    else:
        rngp = np.random.default_rng(3)
        X = jnp.asarray(rngp.integers(0, 1 << 16, (16, n), dtype=np.uint32))
        Y = jnp.asarray(rngp.integers(0, 1 << 16, (16, n), dtype=np.uint32))
    rng = np.random.default_rng(5)
    scal = jnp.asarray(ints_to_limbs(
        [int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(n)]))
    ops = JacobianOps(BN254_G1)
    print(f"backend: {jax.devices()[0]}  n=2^{log2n}  c={c} K={K}",
          flush=True)

    tbl = jax.jit(functools.partial(glv.glv_table, curve=BN254_G1))
    timed("glv_table (once/MSM)", lambda: tbl((X, Y), scal))
    (Xg, Yg), sg = tbl((X, Y), scal)
    n2 = Xg.shape[1]
    B = n2 // K
    nbuckets = 1 << c
    print(f"table n2={n2}  B={B}", flush=True)

    packed = jax.jit(ops.pack_affine)((Xg, Yg))
    row = sg[0]
    dig = jax.jit(lambda r: r & jnp.uint32(nbuckets - 1))(row)

    perm = jax.jit(jnp.argsort)(dig)
    timed("argsort (2^21)", lambda: jax.jit(jnp.argsort)(dig))

    @jax.jit
    def permk_of(perm):
        return perm.reshape(B, K).T.reshape(n2)

    permk = permk_of(perm)
    timed("permk transpose (8MB)", lambda: permk_of(perm))

    @jax.jit
    def big_gather(packed, dig, permk):
        combined = jnp.concatenate([packed, dig[None, :]], axis=0)
        return jnp.take(combined, permk, axis=1)

    G = big_gather(packed, dig, permk)
    timed("concat + 17-row gather", lambda: big_gather(packed, dig, permk))

    @jax.jit
    def prep(G):
        SPk = G[:16]
        sdk_flat = G[16]
        dig_k = sdk_flat.reshape(K, B // 128, 128)
        pk = (SPk.reshape(16, K, B).transpose(1, 0, 2)
              .reshape(16 * K, B // 128, 128))
        return dig_k, pk

    dig_k, pk = prep(G)
    timed("K-major reshape of gathered", lambda: prep(G))

    @jax.jit
    def rakek(dig_k, pk):
        return ops.rake_scan_packed(dig_k, pk, B, K)

    scan_k = rakek(dig_k, pk)
    timed(f"fused rake kernel ({n2} adds)", lambda: rakek(dig_k, pk))

    @jax.jit
    def carries(G, scan0, scan1, scan2):
        sdk_flat = G[16]
        sd = sdk_flat.reshape(K, B).T.reshape(n2)
        sdb = sd.reshape(B, K)
        T = tuple(sc.reshape(16, n2)[:, (K - 1) * B:]
                  for sc in (scan0, scan1, scan2))
        return pippenger._block_carries(ops, sdb, T, B, K)

    timed("block carries (seg-scan w B)", lambda: carries(G, *scan_k))
    C = carries(G, *scan_k)

    @jax.jit
    def tails(G, scan0, scan1, scan2, C0, C1, C2):
        sdk_flat = G[16]
        sd = sdk_flat.reshape(K, B).T.reshape(n2)
        edges = jnp.searchsorted(
            sd, jnp.arange(nbuckets + 1).astype(sd.dtype))
        jidx = jnp.arange(nbuckets)
        count_j = edges[1:] - edges[:-1]
        valid = (count_j > 0) & (jidx > 0)
        tc = jnp.clip(edges[1:].astype(jnp.int32) - 1, 0, n2 - 1)
        kpos = tc % K
        bpos = tc // K
        tk = kpos * B + bpos
        g = tuple(jnp.take(sc.reshape(16, n2), tk, axis=1)
                  for sc in (scan0, scan1, scan2))
        cg = tuple(jnp.take(cc, bpos, axis=-1) for cc in (C0, C1, C2))
        fr_flat = (sd.reshape(B, K) == sd.reshape(B, K)[:, :1]).reshape(n2)
        frj = jnp.take(fr_flat, tc)
        carry = ops.select(frj & valid, cg, ops.infinity((nbuckets,)))
        bt = ops.add_unsafe(g, carry)
        return ops.select(valid, bt, ops.infinity((nbuckets,)))

    buckets = tails(G, *scan_k, *C)
    timed("bucket fill (tails)", lambda: tails(G, *scan_k, *C))

    @jax.jit
    def bphase(bk):
        return bucket_pallas.bucket_phase(bk, nbuckets, BN254_G1.field,
                                          BN254_G1.b)

    timed("FUSED bucket kernel", lambda: bphase(buckets))

    @jax.jit
    def bphase_xla(bk):
        return pippenger._bucket_phase(ops, ops.j2c(bk), nbuckets, 64)

    timed("XLA bucket phase (old)", lambda: bphase_xla(buckets))

    acc1 = ops.c_infinity((1,))
    timed("c_dbl_n(16) width 1",
          lambda: jax.jit(lambda a: ops.c_dbl_n(a, c))(acc1))


if __name__ == "__main__":
    main()
