#!/usr/bin/env python
"""Per-kernel measured performance probe (north star: measured — not
analytical — speed-of-light tables, SURVEY.md §5 "Tracing/profiling").

Times each hot kernel on the current backend (TPU when the axon tunnel is
up) and writes:

- a JSON report to ``PERF_MEASURED.json`` (one entry per kernel with
  wall-clock, achieved rate, and the speed-of-light utilization estimate),
- a markdown table on stdout, ready to paste into PERF.md.

Each probe compiles at most one new XLA executable; on the 1-core dev box a
fresh compile is minutes, so probes run in dependency-light order, persist
via the compile cache (aztec_tpu/utils/jaxcache.py), and every probe is
individually fenced by a budget so a wedged compile can't starve the rest.

Speed-of-light model (TPU v5e, 1 chip): the limb kernels are VPU int32
bound at ~2e12 op/s; `dot`-formulated mont_mul rides the MXU (f32 at
HIGHEST precision ~ 2e13 MAC/s effective); HBM streaming kernels (FFT
stages) bound by ~800 GB/s.  These constants are estimates for the
utilization column only; achieved rates are measured.

Usage:  [PERF_SIZES=16,20] python tools/perf_probe.py [--deep]
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPORT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "PERF_MEASURED.json")
PROBE_BUDGET_S = float(os.environ.get("PERF_PROBE_BUDGET_S", 1800))

# per-chip speed-of-light constants (v5e estimates; utilization col only)
SOL_VPU_INT32 = 2.0e12     # int32 lane ops/s
SOL_HBM_BYTES = 8.0e11     # bytes/s
# one 16x16-limb mont_mul ~ 3 schoolbook passes ~ 3*(2*16*16) int32 MACs
# + carry scans ~ 4*16*log2(16) ops ~ 1.9e3 int32 ops total
MONT_MUL_INT32_OPS = 1.9e3


class Timeout(Exception):
    pass


def _alarm(*a):
    raise Timeout()


def _timed(fn, iters):
    import jax
    r = fn()
    jax.block_until_ready(r)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    deep = "--deep" in sys.argv
    results = {}
    signal.signal(signal.SIGALRM, _alarm)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from aztec_tpu.utils import setup_compile_cache
    setup_compile_cache()

    backend = jax.devices()[0].platform
    results["_meta"] = {"backend": backend, "ts": time.time(),
                        "device": str(jax.devices()[0])}
    print(f"# backend: {jax.devices()[0]}", file=sys.stderr, flush=True)

    from aztec_tpu.ff import limb
    from aztec_tpu.ff.bn254 import FQ, FR

    def probe(name, fn, work_unit, sol_s=None):
        """fn() -> (callable returning device result, iters, work_count)."""
        signal.alarm(int(PROBE_BUDGET_S))
        t_start = time.time()
        try:
            f, iters, work = fn()
            dt = _timed(f, iters)
            rate = work / dt
            results[name] = {
                "wall_s": round(dt, 6),
                "rate": rate,
                "unit": work_unit + "/s",
                "compile_s": round(time.time() - t_start - dt * iters, 1),
            }
            if sol_s:
                results[name]["sol_utilization"] = round(dt and sol_s(work) / dt, 4)
            print(f"# {name}: {rate:.3e} {work_unit}/s "
                  f"(dt={dt*1e3:.2f} ms)", file=sys.stderr, flush=True)
        except Timeout:
            results[name] = {"error": f"timeout>{PROBE_BUDGET_S}s"}
            print(f"# {name}: TIMEOUT", file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": repr(e)[:200]}
            print(f"# {name}: FAILED {e!r}", file=sys.stderr, flush=True)
        finally:
            signal.alarm(0)
            with open(REPORT, "w") as fh:
                json.dump(results, fh, indent=1)

    rng = np.random.default_rng(11)

    def rand_fq(n):
        return jnp.asarray(
            (rng.integers(0, 1 << 16, (16, n), dtype=np.int64)).astype(np.uint32))

    # --- field kernels -----------------------------------------------------
    for k in (16, 20):
        n = 1 << k
        a, b = rand_fq(n), rand_fq(n)

        def mk(a=a, b=b):
            f = jax.jit(lambda x, y: limb.mont_mul(x, y, FQ))
            return (lambda: f(a, b)), 10, a.shape[1]

        probe(f"mont_mul_2pow{k}", mk, "mul",
              sol_s=lambda w: w * MONT_MUL_INT32_OPS / SOL_VPU_INT32)

    n = 1 << 20
    a, b = rand_fq(n), rand_fq(n)
    _jadd = jax.jit(lambda x, y: limb.add_mod(x, y, FQ))
    probe("add_mod_2pow20", lambda: ((lambda: _jadd(a, b)), 10, n), "add")
    _jinv = jax.jit(lambda x: limb.batch_inv_mont(x, FQ))
    probe("batch_inv_2pow16",
          lambda: ((lambda: _jinv(a[:, : 1 << 16])), 4, 1 << 16), "inv")

    # --- polynomial layer --------------------------------------------------
    from aztec_tpu.poly import fft as fftmod
    from aztec_tpu.poly.domain import EvaluationDomain

    for k in (14, 18, 20):
        nf = 1 << k
        coeffs = jnp.asarray(
            rng.integers(0, 1 << 16, (16, nf), dtype=np.int64).astype(np.uint32))
        dom = EvaluationDomain(nf)

        def mkf(coeffs=coeffs, dom=dom, nf=nf):
            return (lambda: fftmod.fft(coeffs, dom)), 5, nf

        # HBM model: log2(n) passes, each streaming 16*4B*n read+write
        probe(f"fft_2pow{k}", mkf, "coeff",
              sol_s=lambda w, k=k: (2 * k * 16 * 4 * w) / SOL_HBM_BYTES)

    # --- MSM (reuses the bench's compiled executables when cached) ---------
    from aztec_tpu.curves.spec import BN254_G1
    from aztec_tpu.msm.pippenger import msm
    from aztec_tpu.numeric.bigint import ints_to_limbs
    from aztec_tpu.ff.bn254 import FR_MOD

    cache = os.path.join(os.path.dirname(REPORT), ".bench_cache")
    sizes = [int(s) for s in os.environ.get("PERF_SIZES", "16,20").split(",")]
    for k in sizes:
        nP = 1 << k
        src = None
        for kk in range(k, 21):
            f = os.path.join(cache, f"points_2pow{kk}.npz")
            if os.path.exists(f):
                src = f
                break
        if src is None:
            print(f"# msm_2pow{k}: no cached points (run bench.py first)",
                  file=sys.stderr, flush=True)
            continue
        d = np.load(src)
        X = jnp.asarray(d["X"][:, :nP])
        Y = jnp.asarray(d["Y"][:, :nP])
        scal = jnp.asarray(ints_to_limbs(
            [int.from_bytes(rng.bytes(32), "little") % FR_MOD
             for _ in range(nP)]))

        def mkm(X=X, Y=Y, scal=scal, nP=nP):
            return (lambda: msm((X, Y), scal, BN254_G1)[0]), 3, nP

        probe(f"msm_2pow{k}", mkm, "point")

    # --- deep: MSM phase dissection ---------------------------------------
    if deep:
        from aztec_tpu.curves.group_ops import JacobianOps

        nP = 1 << 20
        d20 = jnp.asarray(
            rng.integers(0, 1 << 16, (nP,), dtype=np.int64).astype(np.uint32))
        probe("msm_sort_2pow20",
              lambda: ((lambda: jnp.take(d20, jnp.argsort(d20))), 5, nP),
              "elem")

    with open(REPORT, "w") as fh:
        json.dump(results, fh, indent=1)

    # markdown table
    print("| kernel | rate | wall | SoL util | note |")
    print("|---|---|---|---|---|")
    for name, r in results.items():
        if name.startswith("_"):
            continue
        if "error" in r:
            print(f"| {name} | — | — | — | {r['error']} |")
        else:
            u = r.get("sol_utilization")
            print(f"| {name} | {r['rate']:.3e} {r['unit']} "
                  f"| {r['wall_s']*1e3:.2f} ms | "
                  f"{'' if u is None else f'{u:.1%}'} | compile "
                  f"{r['compile_s']:.0f}s |")


if __name__ == "__main__":
    main()
