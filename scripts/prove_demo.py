#!/usr/bin/env python
"""Demo CLI: build a circuit, prove, verify (the rollup_cli smoke analog).

Usage: python scripts/prove_demo.py [standard|turbo] [num_gates]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aztec_tpu.utils import setup_compile_cache

setup_compile_cache()

from aztec_tpu.ff.bn254 import FR_MOD
from aztec_tpu.plonk.composer import StandardComposer, TurboComposer, AddTriple, MulTriple


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "standard"
    num_gates = int(sys.argv[2]) if len(sys.argv) > 2 else 16

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
    c.add_public_variable(0x1234)

    print(f"{kind} circuit: {c.n} gates, subgroup {c.subgroup_size()}")
    t0 = time.perf_counter()
    prover = c.create_prover()
    print(f"keys built in {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    proof = prover.construct_proof()
    print(f"proof ({len(proof)} bytes) in {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    ok = c.create_verifier().verify_proof(proof)
    print(f"verified={ok} in {time.perf_counter()-t0:.1f}s")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
