"""Generate a proof for the matched cross-verification circuit.

Builds the same circuit as tools/ref_cross_verify.cpp (and
tests/test_plonk.py::_build_test_circuit with extra_gates=6, pub=0xCAFEBABE)
with THIS framework's StandardComposer, writes a dev SRS readable by both
sides, proves, self-verifies, and dumps the proof + VK.

Usage:
    python tools/cross_verify_gen.py [workdir=/tmp/xver]
    tools/build_ref_cross_verify.sh
    build/ref_cross_verify <workdir>/srs 6 cafebabe < <workdir>/proof.bin
    # expect "VERIFIED 1" — my proof accepted by the reference verifier.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from aztec_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache()

from aztec_tpu.srs.reference_string import (  # noqa: E402
    FileReferenceStringFactory,
    write_dev_srs,
)
from aztec_tpu.plonk.composer import (  # noqa: E402
    AddTriple,
    MulTriple,
    StandardComposer,
)
from aztec_tpu.ff.bn254 import FR_MOD  # noqa: E402


def main(workdir: str = "/tmp/xver") -> None:
    srs_dir = os.path.join(workdir, "srs")
    os.makedirs(srs_dir, exist_ok=True)
    write_dev_srs(srs_dir, 32)
    print("srs written", flush=True)

    c = StandardComposer(crs_factory=FileReferenceStringFactory(srs_dir))
    c.create_dummy_gates()
    c.add_public_variable(0xCAFEBABE)
    a = c.add_variable(3)
    b = c.add_variable(4)
    prod = c.add_variable(12)
    c.create_mul_gate(MulTriple(a, b, prod, 1, -1, 0))
    acc_val, acc = 12, prod
    for _ in range(6):
        acc_val = (acc_val + 3) % FR_MOD
        nxt = c.add_variable(acc_val)
        c.create_add_gate(AddTriple(acc, a, nxt, 1, 1, -1, 0))
        acc = nxt
    print("gates:", c.n, "subgroup:", c.subgroup_size(), flush=True)

    proof = c.create_prover().construct_proof()
    with open(os.path.join(workdir, "proof.bin"), "wb") as f:
        f.write(proof)
    print("proof written:", len(proof), flush=True)
    ok = c.create_verifier().verify_proof(proof)
    print("self-verifies:", ok, flush=True)

    vk = c.compute_verification_key()
    with open(os.path.join(workdir, "vk.json"), "w") as f:
        json.dump(
            {
                k: None if v is None else [hex(v[0]), hex(v[1])]
                for k, v in vk.commitments.items()
            },
            f,
            indent=1,
        )
    print("vk dumped", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
