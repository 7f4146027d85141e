"""In-circuit recursive transcript vs the native PedersenBlake2s transcript
(ref: stdlib/recursion/transcript/transcript.hpp)."""

import random

from aztec_tpu.transcript.manifest import Manifest, ManifestEntry as E, RoundManifest as RM
from aztec_tpu.transcript.transcript import Transcript
from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.stdlib.recursion_transcript import RecursiveTranscript


def test_challenges_match_native():
    rng = random.Random(9)
    man = Manifest(
        rounds=(
            RM(elements=(E("init_a", 4, True),), challenge="init",
               num_challenges=1),
            RM(elements=(E("W_1", 64, False),), challenge="beta",
               num_challenges=2),
            RM(elements=(E("T_1", 64, False),), challenge="nu",
               num_challenges=3),
        )
    )
    data = {
        "init_a": bytes([0, 0, 0, 16]),
        "W_1": bytes(rng.randrange(256) for _ in range(64)),
        "T_1": bytes(rng.randrange(256) for _ in range(64)),
    }
    nt = Transcript(man, hasher="pedersen_blake2s", num_challenge_bytes=16)
    for k, v in data.items():
        nt.add_element(k, v)
    for r in ("init", "beta", "nu"):
        nt.apply_fiat_shamir(r)

    c = TurboComposer()
    rt = RecursiveTranscript(c, man)
    for k, v in data.items():
        rt.add_element_native(k, v)
    for r in ("init", "beta", "nu"):
        rt.apply_fiat_shamir(r)

    for name, cnt in (("init", 1), ("beta", 2), ("nu", 3)):
        for i in range(cnt):
            assert nt.get_challenge_fr(name, i) == rt.get_challenge(
                name, i
            ).get_value(), (name, i)
    assert check_turbo(c) == []
