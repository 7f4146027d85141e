"""Manifest-driven Fiat-Shamir transcript (ref: plonk/transcript/transcript.cpp).

Byte-exact re-implementation of the reference semantics (verified against
transcript.cpp:95-192):

- each round hashes: previous round's LAST challenge (32 bytes, omitted in
  round 0) || the round's elements in manifest order;
- base hash yields challenges_per_hash = 32 / num_challenge_bytes
  challenges, each right-aligned in a 32-byte field;
- extra challenges come from hash(base_hash || counter) with counter byte
  1, 2, ... (transcript.cpp:151-186);
- hashers: keccak256 (standard settings), blake2s, pedersen+blake2s
  (unrolled/recursive settings).

Challenges consumed as Fr elements are reduced mod r from the big-endian
32-byte value.
"""

from __future__ import annotations

from typing import Callable, Dict, List

from ..crypto import keccak256, blake2s
from ..ff.bn254 import FR_MOD
from .manifest import Manifest

PRNG_OUTPUT_SIZE = 32


def _pedersen_blake2s(b: bytes) -> bytes:
    """ref: transcript.cpp:128-133 — pedersen-compress the buffer to one
    field element, then blake2s it.  Challenge *expansion* (counter hashes)
    uses plain blake2s (transcript.cpp:170-173)."""
    from ..crypto.pedersen import compress_buffer_to_field

    return blake2s(compress_buffer_to_field(b).to_bytes(32, "big"))


# name -> (base_hash, expansion_hash)
HASHERS: Dict[str, tuple] = {
    "keccak256": (lambda b: keccak256(b), lambda b: keccak256(b)),
    "blake2s": (lambda b: blake2s(b), lambda b: blake2s(b)),
    "pedersen_blake2s": (_pedersen_blake2s, lambda b: blake2s(b)),
}


def register_hasher(name: str, base: Callable[[bytes], bytes],
                    expand: Callable[[bytes], bytes] = None):
    HASHERS[name] = (base, expand or base)


class Transcript:
    def __init__(self, manifest: Manifest, hasher: str = "keccak256",
                 num_challenge_bytes: int = 32):
        self.manifest = manifest
        self.hasher_name = hasher
        self.num_challenge_bytes = num_challenge_bytes
        self.elements: Dict[str, bytes] = {}
        self.challenges: Dict[str, List[bytes]] = {}
        self.current_round = 0
        self.current_challenge = b""

    # -- element IO --------------------------------------------------------
    def add_element(self, name: str, data: bytes):
        self.elements[name] = bytes(data)

    def get_element(self, name: str) -> bytes:
        return self.elements[name]

    def has_element(self, name: str) -> bool:
        return name in self.elements

    # -- Fiat-Shamir -------------------------------------------------------
    def _hash(self, data: bytes) -> bytes:
        return HASHERS[self.hasher_name][0](data)

    def _hash_expand(self, data: bytes) -> bytes:
        return HASHERS[self.hasher_name][1](data)

    def apply_fiat_shamir(self, challenge_name: str):
        rm = self.manifest.get_round_manifest(self.current_round)
        assert rm.challenge == challenge_name, (
            f"round {self.current_round}: expected {rm.challenge}, got {challenge_name}"
        )
        num_challenges = rm.num_challenges
        if num_challenges == 0:
            self.current_round += 1
            return

        buf = b""
        if self.current_round > 0:
            buf += self.current_challenge
        for el in rm.elements:
            data = self.elements[el.name]
            assert len(data) == el.num_bytes, (
                f"{el.name}: {len(data)} != {el.num_bytes}"
            )
            buf += data

        base_hash = self._hash(buf)
        per_hash = PRNG_OUTPUT_SIZE // self.num_challenge_bytes
        out: List[bytes] = []

        def emit(h: bytes, j: int):
            c = h[j * self.num_challenge_bytes : (j + 1) * self.num_challenge_bytes]
            out.append(b"\x00" * (PRNG_OUTPUT_SIZE - self.num_challenge_bytes) + c)

        for j in range(per_hash):
            if j < num_challenges:
                emit(base_hash, j)

        num_hashes = (num_challenges + per_hash - 1) // per_hash
        for i in range(1, num_hashes):
            h = self._hash_expand(base_hash + bytes([i]))
            for j in range(per_hash):
                if per_hash * i + j < num_challenges:
                    emit(h, j)

        self.current_challenge = out[-1]
        self.challenges[challenge_name] = out
        self.current_round += 1

    # -- accessors ----------------------------------------------------------
    def get_challenge(self, name: str, idx: int = 0) -> bytes:
        return self.challenges[name][idx]

    def get_challenge_fr(self, name: str, idx: int = 0) -> int:
        return int.from_bytes(self.challenges[name][idx], "big") % FR_MOD

    def get_challenge_fr_from_map(self, challenge_name: str, map_name: str) -> int:
        """ref: transcript.cpp:212-228 get_challenge_from_map.

        Map index -1 returns the constant 1 (used for the 't' and 'z_omega'
        pseudo-challenges in the nu round).
        """
        key = self.manifest.challenge_map()[map_name]
        if key == -1:
            return 1
        return int.from_bytes(self.challenges[challenge_name][key], "big") % FR_MOD

    def get_element_fr(self, name: str) -> int:
        return int.from_bytes(self.elements[name], "big") % FR_MOD

    def has_challenge(self, name: str) -> bool:
        return name in self.challenges

    def export_transcript(self) -> bytes:
        """Serialize all non-derived elements in manifest order (the proof).

        Matches the reference's export_transcript (transcript.cpp:255).
        """
        out = b""
        for r in range(self.manifest.get_num_rounds()):
            for el in self.manifest.get_round_manifest(r).elements:
                if not el.derived_by_verifier:
                    out += self.elements[el.name]
        return out

    @classmethod
    def from_proof(cls, manifest: Manifest, proof: bytes, hasher="keccak256",
                   num_challenge_bytes=32) -> "Transcript":
        t = cls(manifest, hasher, num_challenge_bytes)
        off = 0
        for r in range(manifest.get_num_rounds()):
            for el in manifest.get_round_manifest(r).elements:
                if not el.derived_by_verifier:
                    t.elements[el.name] = proof[off : off + el.num_bytes]
                    off += el.num_bytes
        assert off == len(proof), f"proof length mismatch: {off} != {len(proof)}"
        return t
