#!/usr/bin/env python
"""Prove the full rollup tower for real, through the serving protocol
(VERDICT r2 next-step #3; ref: rollup_cli/main.cpp:115-153 +
rollup/proofs/rollup/verify.hpp:76 + root_rollup/verify.hpp:65-110).

Pipeline, all driven through a proof_worker subprocess exactly as the
sequencer would:

  1. join_split noop proof (unrolled turbo; fixture-cached),
  2. proof_id 0: tx-rollup frame -> inner rollup proof (the rollup circuit
     recursively verifies the tx proof in-circuit),
  3. proof_id 0x202: fetch the inner-rollup VK,
  4. proof_id 1: root-rollup frame carrying the REAL inner proof + VK ->
     root rollup proof (keccak turbo; its verifier runs the final native
     pairing on the recursive accumulators).

Writes ROLLUP_TOWER.json: sha256 + length of each proof, per-stage
wall-clock, ok flags.  Exit 0 iff both rollup proofs verified.

    python tools/rollup_tower.py [num_txs] [out_json]
"""

import hashlib
import json
import os
import struct
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def read_exact(stream, n):
    buf = b""
    while len(buf) < n:
        chunk = stream.read(n - len(buf))
        if not chunk:
            raise EOFError(f"worker died ({len(buf)}/{n} bytes)")
        buf += chunk
    return buf


def read_reply(stdout):
    size = struct.unpack(">I", read_exact(stdout, 4))[0]
    payload = read_exact(stdout, size)
    ok = read_exact(stdout, 1) == b"\x01"
    return payload, ok


def main(argv):
    num_txs = int(argv[1]) if len(argv) > 1 else 1
    out_json = argv[2] if len(argv) > 2 else os.path.join(
        REPO, "ROLLUP_TOWER.json")
    report = {"num_txs": num_txs, "stages": {}}
    t_all = time.time()

    from aztec_tpu.rollup.circuit_data import join_split_circuit_data
    from aztec_tpu.rollup.create_rollup import (
        create_rollup_tx,
        create_root_rollup_tx,
    )
    from aztec_tpu.rollup.serialize import (
        write_rollup_tx,
        write_root_rollup_tx,
    )
    from aztec_tpu.rollup.world_state import WorldState

    t0 = time.time()
    cd = join_split_circuit_data()
    report["stages"]["join_split_padding_proof"] = {
        "seconds": round(time.time() - t0, 2),
        "proof_sha256": hashlib.sha256(cd.padding_proof).hexdigest(),
        "proof_bytes": len(cd.padding_proof),
    }
    print(f"join_split padding proof ready "
          f"({report['stages']['join_split_padding_proof']})", flush=True)

    ws = WorldState(data_depth=6, null_depth=16, root_depth=4)
    rtx = create_rollup_tx(ws, rollup_id=0,
                           tx_proofs=[cd.padding_proof] * num_txs,
                           rollup_size=num_txs)
    body = write_rollup_tx(rtx)

    worker = subprocess.Popen(
        [sys.executable, "-m", "aztec_tpu.serving.proof_worker"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=sys.stderr,
        cwd=REPO,
    )
    assert read_exact(worker.stdout, 1) == b"\x01", "worker not ready"

    # ---- proof_id 0: inner (tx) rollup ------------------------------------
    t0 = time.time()
    worker.stdin.write(struct.pack(">II", 0, num_txs)
                       + struct.pack(">I", len(body)) + body)
    worker.stdin.flush()
    inner_proof, ok0 = read_reply(worker.stdout)
    report["stages"]["tx_rollup"] = {
        "seconds": round(time.time() - t0, 2),
        "ok": ok0,
        "proof_sha256": hashlib.sha256(inner_proof).hexdigest(),
        "proof_bytes": len(inner_proof),
    }
    print(f"tx rollup: {report['stages']['tx_rollup']}", flush=True)

    # ---- proof_id 0x202: inner rollup VK -----------------------------------
    worker.stdin.write(struct.pack(">I", 0x202))
    worker.stdin.flush()
    vk_json, okv = read_reply(worker.stdout)
    assert okv, "no tx-rollup VK cached"

    # ---- proof_id 1: root rollup -------------------------------------------
    root_tx = create_root_rollup_tx(ws, rollup_id=0,
                                    rollup_proofs=[inner_proof],
                                    new_data_root=rtx.new_data_root)
    rbody = write_root_rollup_tx(root_tx)
    t0 = time.time()
    worker.stdin.write(struct.pack(">III", 1, num_txs, 1)
                       + struct.pack(">I", len(vk_json)) + vk_json
                       + struct.pack(">I", len(rbody)) + rbody)
    worker.stdin.flush()
    root_proof, ok1 = read_reply(worker.stdout)
    report["stages"]["root_rollup"] = {
        "seconds": round(time.time() - t0, 2),
        "ok": ok1,
        "proof_sha256": hashlib.sha256(root_proof).hexdigest(),
        "proof_bytes": len(root_proof),
    }
    print(f"root rollup: {report['stages']['root_rollup']}", flush=True)

    worker.stdin.close()
    worker.wait(timeout=60)

    report["total_seconds"] = round(time.time() - t_all, 2)
    report["ok"] = bool(ok0 and ok1)
    import jax

    report["backend"] = jax.devices()[0].platform
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
