"""Fiat-Shamir manifests (ref: plonk/transcript/manifest.hpp:1-54).

A manifest declares, per round, which named elements enter the hash and
which challenge (with how many sub-challenges) the round produces.  Provers
and verifiers share the manifest so transcripts replay identically.
"""

from __future__ import annotations

import dataclasses
from typing import List


@dataclasses.dataclass(frozen=True)
class ManifestEntry:
    name: str
    num_bytes: int
    derived_by_verifier: bool = False
    challenge_map_index: int = 0


@dataclasses.dataclass(frozen=True)
class RoundManifest:
    elements: tuple
    challenge: str
    num_challenges: int
    map_challenges: bool = False

    def includes_element(self, name: str) -> bool:
        return any(e.name == name for e in self.elements)


@dataclasses.dataclass(frozen=True)
class Manifest:
    rounds: tuple

    def get_num_rounds(self) -> int:
        return len(self.rounds)

    def get_round_manifest(self, i: int) -> RoundManifest:
        return self.rounds[i]

    def challenge_map(self) -> dict:
        """element name -> challenge index, for rounds with map_challenges
        (ref: transcript.cpp:72-80 compute_challenge_map)."""
        out = {}
        for rm in self.rounds:
            if rm.map_challenges:
                for el in rm.elements:
                    out[el.name] = el.challenge_map_index
        return out
