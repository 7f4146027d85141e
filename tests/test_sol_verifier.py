"""On-chain verifier emission tests.

No solc exists in this image, so the contract algebra can't be executed;
what CAN be pinned down exactly is (a) the contract's Fiat-Shamir hash
sequence vs the real Transcript implementation (solidity_challenges is a
line-for-line port of TurboVerifier.sol's challenge code), and (b) the
structural sanity of the emitted source tree.
"""

import os
import random

import pytest

from aztec_tpu.contracts.sol_verifier import (
    solidity_challenges,
    write_verifier_sources,
)
from aztec_tpu.plonk.manifests import turbo_manifest
from aztec_tpu.plonk.serialize import u32_to_bytes
from aztec_tpu.transcript.transcript import Transcript

rng = random.Random(4242)

EVAL_ORDER = ("w_1", "w_2", "w_3", "w_4", "sigma_1", "sigma_2", "sigma_3",
              "q_arith", "q_ecc_1", "q_c", "r", "z_omega", "w_1_omega",
              "w_2_omega", "w_3_omega", "w_4_omega")
G1S = ("W_1", "W_2", "W_3", "W_4", "Z", "T_1", "T_2", "T_3", "T_4",
       "PI_Z", "PI_Z_OMEGA")


def test_contract_transcript_matches_python():
    """The hash sequence TurboVerifier.sol computes == Transcript's."""
    num_pub = 3
    n = 64
    manifest = turbo_manifest(num_pub)
    t = Transcript(manifest, hasher="keccak256", num_challenge_bytes=32)

    pub_bytes = rng.randbytes(32 * num_pub)
    g1s = {k: rng.randbytes(64) for k in G1S}
    from aztec_tpu.ff.bn254 import FR_MOD
    evals = {k: rng.randrange(FR_MOD) for k in EVAL_ORDER}
    t_eval = rng.randrange(FR_MOD)

    t.add_element("circuit_size", u32_to_bytes(n))
    t.add_element("public_input_size", u32_to_bytes(num_pub))
    t.apply_fiat_shamir("init")
    t.apply_fiat_shamir("eta")
    t.add_element("public_inputs", pub_bytes)
    for k in ("W_1", "W_2", "W_3", "W_4"):
        t.add_element(k, g1s[k])
    t.apply_fiat_shamir("beta")
    t.add_element("Z", g1s["Z"])
    t.apply_fiat_shamir("alpha")
    for k in ("T_1", "T_2", "T_3", "T_4"):
        t.add_element(k, g1s[k])
    t.apply_fiat_shamir("z")
    t.add_element("t", t_eval.to_bytes(32, "big"))
    for k in EVAL_ORDER:
        t.add_element(k, evals[k].to_bytes(32, "big"))
    t.apply_fiat_shamir("nu")
    t.add_element("PI_Z", g1s["PI_Z"])
    t.add_element("PI_Z_OMEGA", g1s["PI_Z_OMEGA"])
    t.apply_fiat_shamir("separator")

    sol = solidity_challenges(n, pub_bytes, g1s, t_eval,
                              [evals[k] for k in EVAL_ORDER])

    assert sol["beta"] == t.get_challenge_fr("beta", 0)
    assert sol["gamma"] == t.get_challenge_fr("beta", 1)
    assert sol["alpha"] == t.get_challenge_fr("alpha")
    assert sol["zeta"] == t.get_challenge_fr("z")
    for i in range(11):
        assert sol["nu"][i] == t.get_challenge_fr("nu", i), i
    assert sol["separator"] == t.get_challenge_fr("separator")
    # the challenge map the contract hardcodes
    cmap = manifest.challenge_map()
    assert [cmap[k] for k in EVAL_ORDER] == \
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, -1, 0, 1, 2, 3]
    assert cmap["t"] == -1


def test_emitted_source_tree(tmp_path):
    from aztec_tpu.plonk.composer import TurboComposer

    c = TurboComposer()
    c.create_dummy_gate()
    vk = c.compute_verification_key()
    files = write_verifier_sources(str(tmp_path), vk, "Demo")
    names = {os.path.relpath(f, str(tmp_path)) for f in files}
    assert names == {
        "cryptography/Types.sol", "cryptography/Bn254Crypto.sol",
        "cryptography/TurboVerifier.sol", "keys/DemoVk.sol",
        "DemoVerifier.sol",
    }
    for f in files:
        src = open(f).read()
        assert src.count("{") == src.count("}"), f
        assert src.count("(") == src.count(")"), f
        assert "pragma solidity" in src
    vk_src = open(os.path.join(str(tmp_path), "keys/DemoVk.sol")).read()
    assert f"mstore(add(vk, 0x00), {vk.n})" in vk_src
    main = open(os.path.join(str(tmp_path), "DemoVerifier.sol")).read()
    assert "DemoVk.get_verification_key()" in main
