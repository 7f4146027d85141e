"""MSM phase dissection at 2^20 (PERF.md bottleneck #3: 'must be measured
before investing in mul-count optimizations').

Times each phase of one GLV Pippenger round at the bench's 2^20 shapes on
the current backend, each phase in its own (small) jit:

- digit extract + argsort + point gather  (the data-movement phase)
- rake segment scan                        (the n-point-add phase)
- bucket suffix-sum phase                  (2^c buckets)
- accumulator doublings
- one width-32768 mixed_add / c_add        (the rake step unit cost)

Run AFTER bench.py has cached the 2^20 point set:
    python scripts/msm_dissect.py [--log2n 20]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aztec_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache()

import functools  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aztec_tpu.curves.spec import BN254_G1  # noqa: E402
from aztec_tpu.curves.group_ops import JacobianOps  # noqa: E402
from aztec_tpu.msm import pippenger, glv  # noqa: E402
from aztec_tpu.numeric.bigint import ints_to_limbs  # noqa: E402
from aztec_tpu.ff.bn254 import FR_MOD  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed(label, fn, *args, iters=4):
    try:
        t0 = time.time()
        r = fn(*args)
        jax.block_until_ready(r)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / iters
        print(f"{label:34s} {dt*1e3:10.2f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return dt
    except Exception as e:
        print(f"{label:34s} FAILED {e!r}", flush=True)
        return None


def main():
    log2n = 20
    if "--log2n" in sys.argv:
        log2n = int(sys.argv[sys.argv.index("--log2n") + 1])
    n = 1 << log2n
    c, K, K2 = 16, 64, 64

    cache = os.path.join(REPO, ".bench_cache", "points_2pow20.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        X = jnp.asarray(d["X"][:, :n])
        Y = jnp.asarray(d["Y"][:, :n])
    else:
        # timing only: every kernel is branchless/data-independent, so
        # random sub-16-bit planes time identically to real SRS points
        print("# no point cache; using synthetic planes (timing-only)",
              flush=True)
        rngp = np.random.default_rng(3)
        X = jnp.asarray(rngp.integers(0, 1 << 16, (16, n), dtype=np.uint32))
        Y = jnp.asarray(rngp.integers(0, 1 << 16, (16, n), dtype=np.uint32))
    rng = np.random.default_rng(5)
    scal = jnp.asarray(ints_to_limbs(
        [int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(n)]))
    ops = JacobianOps(BN254_G1)
    print(f"backend: {jax.devices()[0]}  n=2^{log2n}  c={c} K={K}", flush=True)

    # GLV table build (once per MSM)
    tbl = jax.jit(functools.partial(glv.glv_table, curve=BN254_G1))
    timed("glv_table (split + 2x table)", lambda: tbl((X, Y), scal))
    (Xg, Yg), sg = tbl((X, Y), scal)
    n2 = Xg.shape[1]
    B = n2 // K

    # phase 1: digit extract + sort + gathers
    @jax.jit
    def sort_phase(Xg, Yg, sg):
        row = sg[0]
        dig = row & jnp.uint32((1 << c) - 1)
        perm = jnp.argsort(dig)
        sd = jnp.take(dig, perm)
        sx = jnp.take(Xg, perm, axis=-1)
        sy = jnp.take(Yg, perm, axis=-1)
        return sd, sx, sy

    timed("sort: digits+argsort+2 gathers", lambda: sort_phase(Xg, Yg, sg))
    sd, sx, sy = sort_phase(Xg, Yg, sg)

    # phase 2: rake segment scan (n point-adds + cross-block fixup)
    @jax.jit
    def rake(sd, sx, sy):
        return pippenger._rake_segment_scan(ops, sd, (sx, sy), B, K)[0]

    timed(f"rake scan ({n2} adds, {K} steps)", lambda: rake(sd, sx, sy))

    # phase 3: bucket suffix-sum phase
    buckets = ops.j2c(ops.infinity((1 << c,)))
    buckets = tuple(jnp.tile(b, (1, 1)) if b.ndim == 2 else b for b in buckets)

    @jax.jit
    def bucket(bk):
        return pippenger._bucket_phase(ops, bk, 1 << c, K2)

    timed(f"bucket phase (2^{c} buckets)", lambda: bucket(buckets))

    # phase 4: accumulator doublings (c per round, width 1)
    acc1 = ops.c_infinity((1,))

    @jax.jit
    def dbls(a):
        def step(_, a):
            return ops.c_dbl(a)
        return jax.lax.fori_loop(0, c, step, a)

    timed(f"{c} doublings (width 1)", lambda: dbls(acc1))

    # unit costs
    xa = (sx[:, :B], sy[:, :B])
    jacc = ops.from_affine(xa)

    @jax.jit
    def one_mixed(j, a):
        return ops.mixed_add_unsafe(j, a)

    timed(f"one mixed_add (width {B})", lambda: one_mixed(jacc, xa))

    cacc = ops.j2c(jacc)

    @jax.jit
    def one_cadd(a, b):
        return ops.c_add(a, b)

    timed(f"one c_add (width {B})", lambda: one_cadd(cacc, cacc))

    from aztec_tpu.ff import limb
    from aztec_tpu.ff.bn254 import FQ

    @jax.jit
    def one_mul(a, b):
        return limb.mont_mul(a, b, FQ)

    timed(f"one mont_mul (width {B})", lambda: one_mul(sx[:, :B], sy[:, :B]))
    timed("one argsort (2^21 u32)", lambda: jax.jit(jnp.argsort)(sd))


if __name__ == "__main__":
    main()
