#!/usr/bin/env python
"""tx_factory: build test rollups and feed them to a proof worker
(ref: rollup/tx_factory/main.cpp — generates noop join_split proofs,
assembles inner/root rollup txs, streams them to rollup_cli).

Usage:
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/tx_factory.py \
        [num_txs] [rollup_size] [out_dir]

Writes rollup_tx.bin / root_rollup_tx.bin wire frames (worker protocol
bodies for proof ids 0/1) under out_dir, and prints the exact frames to
feed serving/proof_worker.py.  Real (SNARK) padding proofs come from the
fixture cache; pass --native to use structurally-valid native proofs
instead (fast, accepted only by the mock/test pipeline).
"""

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    args = [a for a in argv[1:] if not a.startswith("--")]
    native = "--native" in argv
    num_txs = int(args[0]) if len(args) > 0 else 1
    rollup_size = int(args[1]) if len(args) > 1 else num_txs
    out_dir = args[2] if len(args) > 2 else "/tmp/tx_factory"
    os.makedirs(out_dir, exist_ok=True)

    from aztec_tpu.rollup.create_rollup import (
        create_rollup_tx,
        create_root_rollup_tx,
    )
    from aztec_tpu.rollup.serialize import (
        write_rollup_tx,
        write_root_rollup_tx,
    )
    from aztec_tpu.rollup.world_state import WorldState

    ws = WorldState(data_depth=6, null_depth=16, root_depth=4)

    if native:
        from aztec_tpu.sdk import CoreSdk

        sdk = CoreSdk(data_tree_depth=6, prover="native")
        user = sdk.add_user(b"tx_factory")
        proofs = []
        for i in range(num_txs):
            req = sdk.create_join_split(user, public_input=100 + i)
            proofs.append(req.proof_data)
    else:
        from aztec_tpu.rollup.circuit_data import join_split_circuit_data

        cd = join_split_circuit_data()
        proofs = [cd.padding_proof] * num_txs

    rtx = create_rollup_tx(ws, rollup_id=0, tx_proofs=proofs,
                           rollup_size=rollup_size)
    body = write_rollup_tx(rtx)
    p0 = os.path.join(out_dir, "rollup_tx.bin")
    with open(p0, "wb") as f:
        f.write(struct.pack(">II", 0, rollup_size)
                + struct.pack(">I", len(body)) + body)
    print(f"wrote {p0} ({os.path.getsize(p0)} bytes) — proof_id 0 frame")

    root_tx = create_root_rollup_tx(ws, rollup_id=0, rollup_proofs=[body],
                                    new_data_root=rtx.new_data_root)
    rbody = write_root_rollup_tx(root_tx)
    p1 = os.path.join(out_dir, "root_rollup_tx.bin")
    with open(p1, "wb") as f:
        f.write(rbody)
    print(f"wrote {p1} ({os.path.getsize(p1)} bytes) — root_rollup_tx body")
    print("feed the proof worker:  cat rollup_tx.bin | "
          "python -m aztec_tpu.serving.proof_worker")


if __name__ == "__main__":
    main(sys.argv)
