"""In-circuit SHA-256 vs hashlib."""

import hashlib

import pytest

from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.stdlib.field_t import FieldT
from aztec_tpu.stdlib.sha256_circuit import sha256_bytes


@pytest.mark.parametrize("msg", [b"", b"abc", b"a" * 55, b"b" * 64,
                                 b"c" * 100])
def test_sha256_circuit_matches_hashlib(msg):
    c = TurboComposer()
    byte_fs = []
    for b in msg:
        f = FieldT.from_witness(c, b)
        c.create_range_constraint(f.witness_index, 8)
        byte_fs.append(f)
    digest = sha256_bytes(c, byte_fs)
    got = bytes(int(d.get_value()) for d in digest)
    assert got == hashlib.sha256(msg).digest()
    assert not c.failed, c.err
    assert check_turbo(c) == []
