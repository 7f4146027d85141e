#!/usr/bin/env python
"""Multi-chip scaling measurement at realistic shapes (VERDICT r2 #5).

Runs the REALISTIC MSM config (GLV, c=16, n >= 2^17) and the 4n coset FFT
both unsharded and sharded over an 8-device mesh, on the same host.  On a
single-core host with virtual devices, wall-clock cannot show speedup —
what it DOES measure honestly is the *sharding overhead*: T_mesh/T_solo
with identical total work.  overhead = T_mesh/T_solo - 1 bounds the
achievable 2-host efficiency at eff <= 1/(1 + overhead) under linear
compute scaling (communication per sharded_msm.py is O(devices): one
all-gather of one point per device; sharded FFT: one all-to-all).

Usage (the 8-dev flag is REQUIRED for the mesh half):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -u tools/scaling_probe.py [log2n] [out_json]

Writes SCALING.json: per-shape solo/mesh seconds, overhead, projected
2-host efficiency.  Ref: SURVEY §7 phase 7; north star >=80% to 2 hosts.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aztec_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def timed(fn, *args, iters=3):
    r = fn(*args)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, r)
    return (time.perf_counter() - t0) / iters, r


def main(argv):
    log2n = int(argv[1]) if len(argv) > 1 else 17
    out_json = argv[2] if len(argv) > 2 else os.path.join(REPO, "SCALING.json")
    n = 1 << log2n

    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform}", flush=True)
    report = {"log2n": log2n, "devices": len(devs),
              "platform": devs[0].platform}

    from aztec_tpu.curves.spec import BN254_G1
    from aztec_tpu.curves.io import jacobian_to_host
    from aztec_tpu.msm.pippenger import msm, MSMConfig
    from aztec_tpu.parallel.sharded_msm import sharded_msm
    from aztec_tpu.numeric.bigint import ints_to_limbs
    from aztec_tpu.ff.bn254 import FR_MOD
    from aztec_tpu.curves.fixed_base import fixed_base_mul
    from aztec_tpu.curves import group

    # synthetic SRS-like points: tau^i * G in chunks (shape-stable compile)
    rng = np.random.default_rng(11)
    cache = os.path.join(REPO, ".bench_cache", f"points_2pow{log2n}.npz")
    big = os.path.join(REPO, ".bench_cache", "points_2pow20.npz")
    src = cache if os.path.exists(cache) else (
        big if os.path.exists(big) else None)
    if src:
        d = np.load(src)
        X = jnp.asarray(d["X"][:, :n].astype(np.uint32))
        Y = jnp.asarray(d["Y"][:, :n].astype(np.uint32))
    else:
        tau = 0xB0B0CAFE12345678DEADBEEF
        taus = [1]
        for _ in range(n - 1):
            taus.append(taus[-1] * tau % FR_MOD)
        tl = ints_to_limbs(taus)
        xs, ys = [], []
        chunk = min(n, 1 << 14)
        for base in range(0, n, chunk):
            P = fixed_base_mul(jnp.asarray(tl[:, base:base + chunk]), BN254_G1)
            Xc, Yc, _ = group.to_affine(P, BN254_G1.field)
            xs.append(np.asarray(Xc))
            ys.append(np.asarray(Yc))
        X = jnp.asarray(np.concatenate(xs, axis=1))
        Y = jnp.asarray(np.concatenate(ys, axis=1))
    scal = ints_to_limbs([int.from_bytes(rng.bytes(32), "little") % FR_MOD
                          for _ in range(n)])
    scalars = jnp.asarray(scal)

    # Measure the PRODUCTION chunked drivers on both sides — the r4
    # probe measured the monolithic engine the production path no longer
    # uses (VERDICT r4 weak #2).  Solo calls msm_chunked directly (the
    # msm() wrapper only auto-routes there on TPU backends).
    from aztec_tpu.msm.chunked import msm_chunked

    t_solo, r_solo = timed(lambda: msm_chunked((X, Y), scalars, BN254_G1))
    print(f"solo msm 2^{log2n}: {t_solo:.2f}s", flush=True)
    report["msm_solo_s"] = round(t_solo, 3)

    mesh = Mesh(np.array(devs), ("shard",))
    t_mesh, r_mesh = timed(
        lambda: sharded_msm(mesh, "shard", (X, Y), scalars, BN254_G1))
    print(f"mesh msm 2^{log2n}: {t_mesh:.2f}s", flush=True)
    report["msm_mesh_s"] = round(t_mesh, 3)
    assert jacobian_to_host(r_solo, BN254_G1) == \
        jacobian_to_host(r_mesh, BN254_G1), "sharded MSM result mismatch"
    ovh = t_mesh / t_solo - 1
    report["msm_overhead"] = round(ovh, 4)
    report["msm_projected_2host_eff"] = round(1 / (1 + max(ovh, 0)), 4)

    # ---- sharded coset FFT at 4n (the quotient-poly shape) -----------------
    from aztec_tpu.parallel.sharded_fft import sharded_coset_fft
    from aztec_tpu.poly import fft_ops as pfft
    from aztec_tpu.poly.domain import EvaluationDomain

    m = 4 * n
    dom = EvaluationDomain(m)
    coeffs = jnp.asarray(
        ints_to_limbs([int.from_bytes(rng.bytes(32), "little") % FR_MOD
                       for _ in range(m)]))
    t_fsolo, f_solo = timed(lambda: pfft.coset_fft(coeffs, dom))
    print(f"solo coset_fft 4n=2^{log2n+2}: {t_fsolo:.2f}s", flush=True)
    report["fft_solo_s"] = round(t_fsolo, 3)
    t_fmesh, f_mesh = timed(
        lambda: sharded_coset_fft(mesh, "shard", coeffs, dom))
    print(f"mesh coset_fft: {t_fmesh:.2f}s", flush=True)
    report["fft_mesh_s"] = round(t_fmesh, 3)
    fovh = t_fmesh / t_fsolo - 1
    report["fft_overhead"] = round(fovh, 4)
    report["fft_projected_2host_eff"] = round(1 / (1 + max(fovh, 0)), 4)

    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main(sys.argv)
