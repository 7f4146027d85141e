"""Multi-host (DCN) simulation: jax.distributed over N CPU processes.

The reference has NO distributed backend (SURVEY.md §2: single-process
OpenMP); scaling across hosts is new TPU-native work.  This module
validates the cross-host story without pod hardware: N OS processes, each
with K virtual CPU devices (`xla_force_host_platform_device_count`), joined
by `jax.distributed.initialize` into one global mesh of N*K devices — the
same code path a v5p pod uses, with DCN standing in for ICI between
processes.

The hot-path kernel exercised is the sharded Pippenger MSM
(parallel/sharded_msm.py): points/scalars sharded over the global mesh,
per-device partial sums, one all-gather + log-tree combine.  Process 0
cross-checks against a host-computed expected value.

Run: python -m aztec_tpu.parallel.multihost  (spawns the workers itself)
"""

from __future__ import annotations

import os
import subprocess
import sys

N_PROCS = 2
DEVS_PER_PROC = 2
COORD = "localhost:19563"


def _worker(process_id: int, n: int = 128) -> None:
    import jax

    jax.distributed.initialize(
        coordinator_address=COORD,
        num_processes=N_PROCS,
        process_id=process_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..curves.spec import BN254_G1
    from ..curves.pairing import g1_mul, g1_msm
    from ..curves import group
    from ..ff import limb
    from ..ff.bn254 import FR_MOD
    from ..msm.pippenger import MSMConfig
    from ..numeric.bigint import ints_to_limbs, limbs_to_ints
    from .sharded_msm import sharded_msm

    ndev = N_PROCS * DEVS_PER_PROC
    assert len(jax.devices()) == ndev, jax.devices()
    mesh = Mesh(np.array(jax.devices()).reshape(ndev), ("dp",))

    # deterministic global inputs, identical on every process
    tau = 0xB0B0CAFE12345678DEADBEEF
    taus = [1]
    for _ in range(n - 1):
        taus.append(taus[-1] * tau % FR_MOD)
    pts = [g1_mul(t, (1, 2)) for t in taus]
    fq = BN254_G1.field
    Xh = np.asarray(ints_to_limbs([(p[0] * fq.R) % fq.modulus for p in pts]))
    Yh = np.asarray(ints_to_limbs([(p[1] * fq.R) % fq.modulus for p in pts]))
    rng = np.random.default_rng(3)
    sh = np.asarray(ints_to_limbs(
        [int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(n)]
    ))

    sharding = NamedSharding(mesh, P(None, "dp"))

    def to_global(a):
        # each process contributes its local shard of the global array
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx: a[idx]
        )

    X, Y, S = to_global(Xh), to_global(Yh), to_global(sh)
    cfg = MSMConfig(c=4, block=16, bucket_block=4)
    with mesh:
        out = sharded_msm(mesh, "dp", (X, Y), S, BN254_G1, cfg)
    jax.block_until_ready(out)

    if process_id == 0:
        from jax.experimental import multihost_utils

        local = [np.asarray(multihost_utils.process_allgather(a))
                 for a in out]
        # process_allgather returns per-process copies of the replicated
        # value; take this process's
        vals = [v[0] if v.ndim == 3 else v for v in local]
        svals = limbs_to_ints(sh)
        expected = g1_msm(list(zip(svals, pts)))
        x, y, inf = group.to_affine(tuple(jnp.asarray(v) for v in vals), fq)
        got = None
        if not bool(np.asarray(inf)[0]):
            got = (
                limbs_to_ints(np.asarray(limb.from_mont(x, fq)))[0],
                limbs_to_ints(np.asarray(limb.from_mont(y, fq)))[0],
            )
        assert got == expected, f"multihost MSM mismatch: {got} != {expected}"
        print("MULTIHOST OK", flush=True)
    jax.distributed.shutdown()


def launch(timeout_s: int = 1800) -> bool:
    """Spawn the N workers; True iff process 0 printed MULTIHOST OK."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={DEVS_PER_PROC}",
    )
    procs = []
    for pid in range(N_PROCS):
        procs.append(subprocess.Popen(
            [sys.executable, "-u", "-m", "aztec_tpu.parallel.multihost",
             str(pid)],
            env=env,
            stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
            stderr=sys.stderr, text=True,
        ))
    try:
        out, _ = procs[0].communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        return False
    for p in procs[1:]:
        p.wait(timeout=60)
    return "MULTIHOST OK" in (out or "")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        _worker(int(sys.argv[1]))
    else:
        ok = launch()
        print(f"multihost dryrun: {'ok' if ok else 'FAILED'}")
        sys.exit(0 if ok else 1)
