"""Long-lived proof worker over stdin/stdout (ref: rollup_cli/main.cpp).

Protocol (all integers big-endian, matching the reference's serialize.hpp):

  worker -> client on start:  bool ready (1 byte, 0x01)
  client -> worker, repeated: u32 proof_id, then a request body
  worker -> client:           vector<u8> proof (u32 length prefix) + u8 ok

proof_id (ref: rollup_cli/main.cpp:131-149):
  0      tx-rollup proof: body = u32 num_txs, then a serialized rollup_tx
         (rollup/serialize.py wire format) — recursively verifies the tx
         proofs in the inner rollup circuit and proves it (unrolled turbo)
  1      root-rollup proof: body = u32 num_txs, u32 num_proofs, then a
         serialized root_rollup_tx — aggregates inner rollups (standard
         turbo/Keccak for on-chain verification)
  0x100  standard-PLONK demo proof: body = u32 num_gates (builds the
         benchmark circuit of that size, proves, returns proof bytes)
  0x101  turbo-PLONK demo proof: same body
  0x200  join_split verification key (no body; u32-prefixed JSON reply —
         halloumi getJoinSplitVk, server.ts:34-36)
  0x201  account verification key (halloumi getAccountVk, server.ts:38-40)
  0x202  VK of the tx-rollup circuit proved by the last proof_id-0 request
         (u32-prefixed JSON; the root-rollup frame carries this VK)

Deviations from rollup_cli: tx bodies are u32-length-prefixed (the
reference streams them unframed), and proof_id 1 carries the inner-rollup
VK as u32-prefixed JSON (the reference recomputes it from persisted
circuit data).

This gives the serving seam (one resident proving key, stream of requests,
stateless per request — halloumi restarts the worker on reset()) without the
rollup circuits, and doubles as the harness the benchmark driver uses.
"""

from __future__ import annotations

import struct
import sys


def _read_exact(stream, n: int) -> bytes:
    data = stream.read(n)
    if data is None or len(data) < n:
        raise EOFError
    return data


def _build_demo_circuit(kind: str, num_gates: int):
    from ..plonk.composer import StandardComposer, TurboComposer, AddTriple, MulTriple
    from ..ff.bn254 import FR_MOD

    c = StandardComposer() if kind == "standard" else TurboComposer()
    a = c.add_variable(3)
    b = c.add_variable(4)
    prod = c.add_variable(12)
    c.create_mul_gate(MulTriple(a, b, prod, 1, -1, 0))
    acc_val, acc = 12, prod
    while c.n < num_gates:
        acc_val = (acc_val + 3) % FR_MOD
        nxt = c.add_variable(acc_val)
        c.create_add_gate(AddTriple(acc, a, nxt, 1, 1, -1, 0))
        acc = nxt
    return c


def _create_tx_rollup(body_stream, log, state=None):
    """proof_id 0 (ref: rollup_cli/main.cpp:31-66): prove an inner rollup
    over the received tx proofs.  Returns (proof_bytes, verified).  The
    circuit's unrolled-turbo VK is cached in ``state`` for the 0x202
    query (the root-rollup client needs it to assemble its frame)."""
    from ..plonk.composer import TurboComposer
    from ..rollup.circuit_data import join_split_circuit_data
    from ..rollup.rollup_circuit import rollup_circuit
    from ..rollup.serialize import read_rollup_tx
    from ..srs.reference_string import FakeReferenceStringFactory

    num_txs = struct.unpack(">I", _read_exact(body_stream, 4))[0]
    body = _read_exact(body_stream,
                       struct.unpack(">I", _read_exact(body_stream, 4))[0])
    tx = read_rollup_tx(body)
    print(f"received tx rollup with {tx.num_txs} txs", file=log, flush=True)

    cd = join_split_circuit_data()
    # pad to the requested rollup size with noop proofs
    while len(tx.txs) < num_txs:
        tx.txs.append(cd.padding_proof)

    composer = TurboComposer(crs_factory=FakeReferenceStringFactory())
    rollup_circuit(composer, tx, [cd.vk], rollup_size=num_txs)
    if composer.failed:
        print(f"rollup circuit failed: {composer.err}", file=log, flush=True)
        return b"", False
    proof = composer.create_unrolled_prover().construct_proof()
    ok = composer.create_unrolled_verifier().verify_proof(proof)
    if state is not None:
        import dataclasses as _dc

        from ..plonk import manifests

        state["tx_rollup_vk"] = _dc.replace(
            composer.compute_verification_key(),
            settings=manifests.UNROLLED_TURBO)
    return proof, ok


def _create_root_rollup(body_stream, log, state=None):
    """proof_id 1 (ref: rollup_cli/main.cpp:68-113)."""
    from ..plonk.composer import TurboComposer
    from ..rollup.root_rollup_circuit import root_rollup_circuit
    from ..rollup.serialize import read_root_rollup_tx
    from ..srs.reference_string import FakeReferenceStringFactory
    from ..utils.fixtures import vk_from_json

    _num_txs = struct.unpack(">I", _read_exact(body_stream, 4))[0]
    num_proofs = struct.unpack(">I", _read_exact(body_stream, 4))[0]
    # the inner-rollup VK accompanies the request (u32-prefixed JSON; the
    # reference recomputes it from circuit data instead)
    vk_json = _read_exact(
        body_stream, struct.unpack(">I", _read_exact(body_stream, 4))[0])
    inner_vk = vk_from_json(vk_json.decode())
    body = _read_exact(body_stream,
                       struct.unpack(">I", _read_exact(body_stream, 4))[0])
    tx = read_root_rollup_tx(body)
    print(f"received root rollup with {len(tx.rollups)} rollups",
          file=log, flush=True)

    composer = TurboComposer(crs_factory=FakeReferenceStringFactory())
    root_rollup_circuit(composer, tx, inner_rollup_size=_num_txs,
                        outer_rollup_size=_num_txs * num_proofs,
                        inner_verification_key=inner_vk)
    if composer.failed:
        print(f"root rollup failed: {composer.err}", file=log, flush=True)
        return b"", False
    proof = composer.create_prover().construct_proof()
    ok = composer.create_verifier().verify_proof(proof)
    return proof, ok


def serve(stdin=None, stdout=None, log=sys.stderr):
    # persistent XLA executables: a restarted worker must not recompile
    # the prover kernels (halloumi restarts us on every reset())
    from ..utils import setup_compile_cache

    setup_compile_cache()

    stdin = stdin or sys.stdin.buffer
    stdout = stdout or sys.stdout.buffer

    stdout.write(b"\x01")
    stdout.flush()

    circuits = {}
    while True:
        try:
            proof_id = struct.unpack(">I", _read_exact(stdin, 4))[0]
        except EOFError:
            return
        if proof_id in (0, 1):
            try:
                fn = _create_tx_rollup if proof_id == 0 else _create_root_rollup
                proof, ok = fn(stdin, log, state=circuits)
            except EOFError:
                return
            except Exception as e:  # reject, keep serving
                print(f"proof_id {proof_id} error: {e!r}", file=log,
                      flush=True)
                proof, ok = b"", False
            stdout.write(struct.pack(">I", len(proof)) + proof)
            stdout.write(b"\x01" if ok else b"\x00")
            stdout.flush()
        elif proof_id in (0x100, 0x101):
            num_gates = struct.unpack(">I", _read_exact(stdin, 4))[0]
            kind = "standard" if proof_id == 0x100 else "turbo"
            key = (kind, num_gates)
            if key not in circuits:
                circuits[key] = _build_demo_circuit(kind, num_gates)
            c = circuits[key]
            print(f"proving {kind} circuit, {c.n} gates...", file=log, flush=True)
            proof = c.create_prover().construct_proof()
            ok = c.create_verifier().verify_proof(proof)
            stdout.write(struct.pack(">I", len(proof)) + proof)
            stdout.write(b"\x01" if ok else b"\x00")
            stdout.flush()
        elif proof_id == 0x202:
            # VK of the tx-rollup circuit proved by the last id-0 request
            # (the root-rollup frame carries this VK; the reference instead
            # recomputes it from persisted circuit data)
            from ..utils.fixtures import vk_to_json

            vk = circuits.get("tx_rollup_vk")
            if vk is None:
                payload, ok = b"", False
            else:
                payload, ok = vk_to_json(vk).encode(), True
            stdout.write(struct.pack(">I", len(payload)) + payload)
            stdout.write(b"\x01" if ok else b"\x00")
            stdout.flush()
        elif proof_id in (0x200, 0x201):
            # verification-key queries (halloumi getJoinSplitVk /
            # getAccountVk, server.ts:34-40) — body-less request, returns
            # the circuit VK as u32-prefixed JSON
            from ..rollup.circuit_data import (
                account_circuit_data,
                join_split_circuit_data,
            )
            from ..utils.fixtures import vk_to_json

            try:
                cd = (join_split_circuit_data() if proof_id == 0x200
                      else account_circuit_data())
                payload, ok = vk_to_json(cd.vk).encode(), True
            except Exception as e:
                print(f"vk query error: {e!r}", file=log, flush=True)
                payload, ok = b"", False
            stdout.write(struct.pack(">I", len(payload)) + payload)
            stdout.write(b"\x01" if ok else b"\x00")
            stdout.flush()
        else:
            # unknown id: we can't know the payload length, so the stream
            # is unrecoverable — send an empty failed frame then exit; the
            # HTTP layer's reset() restarts us (halloumi server.ts:46-49)
            print(f"unknown proof_id {proof_id}", file=log, flush=True)
            stdout.write(struct.pack(">I", 0) + b"\x00")
            stdout.flush()
            return


if __name__ == "__main__":
    serve()
