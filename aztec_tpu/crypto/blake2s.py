"""blake2s-256 (stdlib-backed; ref: crypto/blake2s/)."""

import hashlib


def blake2s(data: bytes) -> bytes:
    return hashlib.blake2s(data).digest()
