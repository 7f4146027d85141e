"""Long-lived proof worker over stdin/stdout (ref: rollup_cli/main.cpp).

Protocol (all integers big-endian, matching the reference's serialize.hpp):

  worker -> client on start:  bool ready (1 byte, 0x01)
  client -> worker, repeated: u32 proof_id, then a request body
  worker -> client:           vector<u8> proof (u32 length prefix) + u8 ok

proof_id:
  0x100  standard-PLONK demo proof: body = u32 num_gates (builds the
         benchmark circuit of that size, proves, returns proof bytes)
  0x101  turbo-PLONK demo proof: same body
  (0 / 1: tx-rollup and root-rollup proofs — pending the recursion stack)

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


def serve(stdin=None, stdout=None, log=sys.stderr):
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
        if proof_id in (0x100, 0x101):
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
