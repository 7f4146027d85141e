"""In-circuit BLAKE2s vs hashlib (ref: stdlib/hash/blake2s/)."""

import hashlib

from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.stdlib.blake2s_circuit import (
    blake2s_words,
    blake2s_bytes_to_words,
    digest_bytes,
)


def _run(msg: bytes):
    c = TurboComposer()
    words, n = blake2s_bytes_to_words(c, msg)
    out = blake2s_words(c, words, n)
    assert digest_bytes(out) == hashlib.blake2s(msg).digest()
    assert check_turbo(c) == []
    return c


def test_single_block():
    _run(b"abc")


def test_two_blocks():
    _run(bytes(range(100)))


def test_exact_block_boundary():
    _run(bytes(64))
