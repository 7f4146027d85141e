"""Scaled cross-verification: prove a 2^k-gate Standard circuit on the TPU
and verify it with the REFERENCE verifier (BASELINE config 3 at k=17).

Same matched-circuit contract as tools/cross_verify_gen.py (the chain
circuit mirrored by tools/ref_cross_verify.cpp), but:

- gate count is a parameter (default: fill a 2^17 subgroup),
- runs on the default backend (the real TPU when the axon tunnel is up;
  set JAX_PLATFORMS=cpu to force the host),
- the dev SRS is sliced from the bench's TPU-generated point cache when
  available (.bench_cache/points_2pow20.npz holds tau^i * G for the same
  dev tau — minutes of host scalar-muls skipped), falling back to
  write_dev_srs.

Usage:
    python tools/cross_verify_big.py [workdir=/tmp/xver17] [log2n=17]
    tools/build_ref_cross_verify.sh    # once
    build/ref_cross_verify <workdir>/srs <extra_gates> cafebabe \
        < <workdir>/proof.bin          # expect "VERIFIED 1"

The script prints `extra_gates` and writes it to <workdir>/extra_gates.txt
for the reference invocation.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aztec_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEV_TAU = 0xB0B0CAFE12345678DEADBEEF


def write_srs(srs_dir: str, npoints: int) -> None:
    """Ignition-layout transcript00.dat with [tau^1..tau^n]G, fast path via
    the bench point cache (tau^i * G, i from 0, Montgomery limb planes)."""
    from aztec_tpu.srs import io as srs_io
    from aztec_tpu.srs.reference_string import write_dev_srs
    from aztec_tpu.curves import tower
    from aztec_tpu.ff.bn254 import FQ
    from aztec_tpu.numeric.bigint import ints_to_limbs, limbs_to_ints

    os.makedirs(srs_dir, exist_ok=True)
    cache = os.path.join(REPO, ".bench_cache", "points_2pow20.npz")
    if not os.path.exists(cache) or npoints + 1 > (1 << 20):
        write_dev_srs(srs_dir, npoints)
        return

    import numpy as np

    d = np.load(cache)
    # cache index i = tau^i * G; the transcript stores tau^1 .. tau^n
    X = d["X"][:, 1 : npoints + 1]
    Y = d["Y"][:, 1 : npoints + 1]
    rinv = pow(FQ.R, -1, FQ.modulus)
    xs = [v * rinv % FQ.modulus for v in limbs_to_ints(X)]
    ys = [v * rinv % FQ.modulus for v in limbs_to_ints(Y)]
    srs_io.write_transcript(
        os.path.join(srs_dir, "transcript00.dat"),
        ints_to_limbs(xs),
        ints_to_limbs(ys),
        [tower.g2_mul(DEV_TAU, tower.G2_GEN), tower.G2_GEN],
    )


def main(workdir: str = "/tmp/xver17", log2n: str = "17") -> None:
    from aztec_tpu.srs.reference_string import FileReferenceStringFactory
    from aztec_tpu.plonk.composer import AddTriple, MulTriple, StandardComposer
    from aztec_tpu.ff.bn254 import FR_MOD

    target = 1 << int(log2n)
    srs_dir = os.path.join(workdir, "srs")
    os.makedirs(workdir, exist_ok=True)

    t0 = time.time()
    if not os.path.exists(os.path.join(srs_dir, "transcript00.dat")):
        write_srs(srs_dir, target + 1)
        print(f"srs written ({target + 1} pts, {time.time()-t0:.0f}s)",
              flush=True)

    # chain length that fills the target subgroup exactly: base circuit is
    # dummy(2 gates w/ 3 fresh vars) + 1 public input + mul gate; subgroup =
    # next_pow2(n + pub + NUM_RESERVED_GATES(=4)); leave 8 spare rows.
    extra = target - 16
    c = StandardComposer(crs_factory=FileReferenceStringFactory(srs_dir))
    c.create_dummy_gates()
    c.add_public_variable(0xCAFEBABE)
    a = c.add_variable(3)
    b = c.add_variable(4)
    prod = c.add_variable(12)
    c.create_mul_gate(MulTriple(a, b, prod, 1, -1, 0))
    acc_val, acc = 12, prod
    for _ in range(extra):
        acc_val = (acc_val + 3) % FR_MOD
        nxt = c.add_variable(acc_val)
        c.create_add_gate(AddTriple(acc, a, nxt, 1, 1, -1, 0))
        acc = nxt
    assert c.subgroup_size() == target, (c.subgroup_size(), target)
    print(f"gates: {c.n} subgroup: {c.subgroup_size()} "
          f"(built {time.time()-t0:.0f}s)", flush=True)
    with open(os.path.join(workdir, "extra_gates.txt"), "w") as f:
        f.write(str(extra))

    t1 = time.time()
    prover = c.create_prover()
    print(f"proving key ready ({time.time()-t1:.0f}s)", flush=True)

    t2 = time.time()
    proof = prover.construct_proof()
    t_first = time.time() - t2
    print(f"proof constructed ({t_first:.1f}s incl. compile)", flush=True)

    # warm timing (the honest prover wall-clock number)
    t3 = time.time()
    proof = c.create_prover().construct_proof()
    t_warm = time.time() - t3
    print(f"warm prove: {t_warm:.2f}s", flush=True)

    with open(os.path.join(workdir, "proof.bin"), "wb") as f:
        f.write(proof)
    ok = c.create_verifier().verify_proof(proof)
    print("self-verifies:", ok, flush=True)
    assert ok

    vk = c.compute_verification_key()
    with open(os.path.join(workdir, "vk.json"), "w") as f:
        json.dump(
            {k: None if v is None else [hex(v[0]), hex(v[1])]
             for k, v in vk.commitments.items()},
            f, indent=1)
    with open(os.path.join(workdir, "timing.json"), "w") as f:
        json.dump({"subgroup": target, "prove_cold_s": round(t_first, 2),
                   "prove_warm_s": round(t_warm, 2)}, f)
    print("done; run:", flush=True)
    print(f"  build/ref_cross_verify {srs_dir} {extra} cafebabe "
          f"< {workdir}/proof.bin", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
