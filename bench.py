#!/usr/bin/env python
"""Headline benchmark: Pippenger MSM throughput (BN254 G1), target 2^20 points.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The MSM is the reference's #1 prover hot spot (SURVEY.md §2, scalar_
multiplication.cpp): a 1M-gate proof runs ~9 MSMs of 2^20.  vs_baseline is
points/s relative to the analytical reference throughput of multithreaded
barretenberg on a contemporary CPU host (~2^20 points in ~0.35 s ≈ 3.0e6
points/s; derived from the in-repo complexity analysis 2^24 point-adds/MSM
at ~6 field muls per add on all cores — no published numbers exist, see
BASELINE.md).

Robustness contract (VERDICT r1: the bench MUST emit a number):

- supervisor/worker split: the parent process NEVER imports jax, so it
  stays responsive to SIGTERM and its own deadline even while the worker
  is wedged inside a GIL-holding XLA compile RPC (observed on the
  tunneled TPU backend: a worker can ignore SIGTERM for hours) — on
  budget expiry or SIGTERM the parent kills the worker and emits the
  best result parsed from the worker's progress lines,
- sizes ramp 2^14 -> 2^20; the largest completed size wins,
- generated point sets and XLA executables persist (.bench_cache/,
  .jax_cache/), so successive runs ratchet toward the full 2^20 result.
"""

import json
import os
import signal
import subprocess
import sys
import time

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1500))
MAX_LOG2 = int(os.environ.get("BENCH_MSM_MAXLOG2", 20))
# 2^16/2^18 rungs (VERDICT r3 weak #8): a budget shortfall now degrades
# the reported size gradually instead of cliff-dropping 2^20 -> 2^14
SIZES = [n for n in (10, 14, 16, 18, 20) if n <= MAX_LOG2] or [MAX_LOG2]
BASELINE_POINTS_PER_S = 3.0e6
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")


# --------------------------- supervisor ------------------------------------

def supervise():
    t0 = time.time()
    best = None  # (log2n, pps)
    done = {"v": False}
    platform = {"v": ""}

    # Probe the backend in a DISPOSABLE child first: a hung axon tunnel
    # wedges jax.devices() in a GIL-holding RPC that ignores signals, so
    # the probe must be killable from outside.
    env = dict(os.environ, BENCH_WORKER="1")
    probe_budget = min(600, BUDGET_S / 3)
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            timeout=probe_budget, capture_output=True, text=True,
        )
        plat = probe.stdout.strip()
        if probe.returncode != 0 or not plat:
            raise RuntimeError(probe.stderr[-200:])
        print(f"# backend probe: {plat}", file=sys.stderr, flush=True)
    except Exception as e:
        print(f"# backend probe failed ({e!r}); forcing CPU fallback",
              file=sys.stderr, flush=True)
        env["JAX_PLATFORMS"] = "cpu"

    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__)],
        env=env,
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
    )

    def emit_and_exit(code=0):
        if not done["v"]:
            done["v"] = True
            if best is None:
                print(json.dumps({
                    "metric": "msm_bn254_points_per_s",
                    "value": 0.0,
                    "unit": "points/s",
                    "vs_baseline": 0.0,
                    "note": "no size completed within budget",
                }), flush=True)
            else:
                log2n, pps = best
                tag = ("" if platform["v"] in ("", "tpu")
                       else f"{platform['v']}_fallback_")
                rec = {
                    "metric": f"msm_bn254_{tag}2pow{log2n}_points_per_s",
                    "value": round(pps, 1),
                    "unit": "points/s",
                    "vs_baseline": round(pps / BASELINE_POINTS_PER_S, 4),
                }
                # auxiliary committed measurements (same line, extra keys):
                # latest TPU prover wall-clocks so the driver's record
                # carries the full-prover number every round (VERDICT r4
                # next-step #2)
                try:
                    pb = os.path.join(os.path.dirname(
                        os.path.abspath(__file__)), "PROVER_BENCH.json")
                    with open(pb) as f:
                        for r in json.load(f):
                            if r.get("backend") == "tpu" and r.get(
                                    "verified"):
                                k = (f"prover_2pow{r['log2_gates']}_"
                                     f"{r['flavor']}_warm_s")
                                rec[k] = r["warm_prove_s"]
                except Exception:
                    pass
                print(json.dumps(rec), flush=True)
        try:
            proc.kill()
        except Exception:
            pass
        os._exit(code)

    signal.signal(signal.SIGTERM, lambda *a: emit_and_exit(0))
    signal.signal(signal.SIGINT, lambda *a: emit_and_exit(0))
    signal.signal(signal.SIGALRM, lambda *a: emit_and_exit(0))
    signal.alarm(max(int(BUDGET_S), 1))

    # parent blocks on worker output; alarm/SIGTERM break us out
    for line in proc.stdout:
        line = line.strip()
        if line.startswith("#PLATFORM"):
            platform["v"] = line.split()[1]
        if line.startswith("#RESULT"):
            _, k, pps = line.split()
            k, pps = int(k), float(pps)
            if best is None or k > best[0]:
                best = (k, pps)
            print(f"# 2^{k}: {pps:.3e} points/s "
                  f"(elapsed {time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
    proc.wait()
    emit_and_exit(0)


# ----------------------------- worker --------------------------------------

def worker():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import numpy as np
    import jax

    # the axon PJRT plugin ignores the JAX_PLATFORMS env var on some
    # builds (observed r4); the config knob is authoritative
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # the axon TPU tunnel can be down for hours; a CPU number with an
    # honest metric name beats no number (the supervisor prefixes the
    # metric with the platform the worker reports)
    try:
        backend = jax.devices()[0].platform
    except Exception as e:
        print(f"# TPU backend unavailable ({e!r}); falling back to CPU",
              file=sys.stderr, flush=True)
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        backend = jax.devices()[0].platform
    print(f"#PLATFORM {backend}", flush=True)

    import jax.numpy as jnp

    from aztec_tpu.utils import setup_compile_cache

    setup_compile_cache()

    from aztec_tpu.curves.spec import BN254_G1
    from aztec_tpu.curves.fixed_base import fixed_base_mul
    from aztec_tpu.curves import group
    from aztec_tpu.msm.pippenger import msm
    from aztec_tpu.numeric.bigint import ints_to_limbs
    from aztec_tpu.ff.bn254 import FR_MOD

    rng = np.random.default_rng(7)
    nmax = 1 << max(SIZES)

    tau = 0xB0B0CAFE12345678DEADBEEF
    taus = [1]
    for _ in range(nmax - 1):
        taus.append(taus[-1] * tau % FR_MOD)
    tau_limbs = ints_to_limbs(taus)
    scal_ints = [
        int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(nmax)
    ]
    scal_limbs = ints_to_limbs(scal_ints)

    def get_points(log2n):
        """SRS-like affine points (tau^i * G, Montgomery planes), disk-cached
        PER SIZE (VERDICT r2 weak #1: 2^10/2^14 must never wait on the 2^20
        table).  A larger cached size serves smaller ones by prefix-slicing.
        Planes are stored as uint16 (they are 16-bit limbs) to halve disk;
        chunk checkpoints (shape-fixed at <=2^16 so the fixed-base mul
        compiles once) make 2^20 generation resumable across budget-killed
        runs.  Chunking also bounds the (L, L, n) mont_mul outer-product
        intermediates below HBM limits."""
        os.makedirs(CACHE_DIR, exist_ok=True)
        n = 1 << log2n
        for k in sorted((s for s in SIZES if s >= log2n), reverse=True):
            f = os.path.join(CACHE_DIR, f"points_2pow{k}.npz")
            if os.path.exists(f):
                d = np.load(f)
                return (jnp.asarray(d["X"][:, :n].astype(np.uint32)),
                        jnp.asarray(d["Y"][:, :n].astype(np.uint32)))
        f = os.path.join(CACHE_DIR, f"points_2pow{log2n}.npz")
        chunk = min(n, 1 << 16)
        xs, ys = [], []
        for base in range(0, n, chunk):
            cf = os.path.join(CACHE_DIR, f"chunk_{chunk}_{base}.npz")
            if os.path.exists(cf):
                d = np.load(cf)
                xs.append(d["X"])
                ys.append(d["Y"])
                continue
            sc_tbl = jnp.asarray(tau_limbs[:, base:base + chunk])
            P = fixed_base_mul(sc_tbl, BN254_G1)
            Xc, Yc, inf = group.to_affine(P, BN254_G1.field)
            xs.append(np.asarray(Xc).astype(np.uint16))
            ys.append(np.asarray(Yc).astype(np.uint16))
            np.savez(cf, X=xs[-1], Y=ys[-1])
            print(f"# points chunk {base + chunk}/{n}",
                  file=sys.stderr, flush=True)
        Xall = np.concatenate(xs, axis=1)
        Yall = np.concatenate(ys, axis=1)
        np.savez(f, X=Xall, Y=Yall)
        for base in range(0, n, chunk):
            cf = os.path.join(CACHE_DIR, f"chunk_{chunk}_{base}.npz")
            if os.path.exists(cf):
                os.remove(cf)
        return (jnp.asarray(Xall.astype(np.uint32)),
                jnp.asarray(Yall.astype(np.uint32)))

    from aztec_tpu.curves import golden
    from aztec_tpu.curves.io import jacobian_to_host

    for log2n in SIZES:
        n = 1 << log2n
        try:
            X, Y = get_points(log2n)
            scalars = jnp.asarray(scal_limbs[:, :n])
            r = msm((X, Y), scalars, BN254_G1)  # warm-up (compile)
            r[0].block_until_ready()

            # correctness gate, EVERY size (VERDICT r4 weak #5): points are
            # tau^i * G, so the expected MSM result is
            # (sum_i k_i tau^i mod r) * G — O(n) host modmuls (seconds at
            # 2^20) + one host scalar-mul.  An unverified headline number
            # is worthless.
            kk = sum(
                s * t for s, t in zip(scal_ints[:n], taus[:n])
            ) % BN254_G1.order
            expect = golden.GoldenCurve(BN254_G1).mul(
                kk, (BN254_G1.gen_x, BN254_G1.gen_y))
            got = jacobian_to_host(r, BN254_G1)[0]  # width-1 batch
            if got != expect:
                raise RuntimeError("MSM result mismatch vs host golden")
            print(f"# 2^{log2n} correctness OK", file=sys.stderr,
                  flush=True)

            # honest timing: every iteration rolls the WHOLE scalar array
            # (fresh values in every limb plane), because the tunneled
            # backend memoizes identical (executable, args) executions —
            # a single-element tweak left same-digit rounds memoized and
            # inflated the r4 headline (chip_probe dep-test, r5)
            iters = 3 if log2n < 20 else 2
            t1 = time.perf_counter()
            for it in range(iters):
                sc2 = jnp.roll(scalars, it + 1, axis=1)
                r = msm((X, Y), sc2, BN254_G1)
            r[0].block_until_ready()
            dt = (time.perf_counter() - t1) / iters
            print(f"#RESULT {log2n} {n / dt}", flush=True)
        except Exception as e:
            print(f"# 2^{log2n} failed: {e!r}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    if os.environ.get("BENCH_WORKER"):
        worker()
    else:
        supervise()
