"""Flat C ABI (native/src/c_bind.cpp) vs the Python host crypto layer.

The c_bind surface mirrors the reference's crypto c_bind exports
(crypto/pedersen/c_bind.cpp, crypto/blake2s/c_bind.cpp,
crypto/schnorr/c_bind.cpp); these tests pin it bit-for-bit against
aztec_tpu/crypto (which is itself cross-verified against the reference
through the transcript/proof pipeline).
"""

import hashlib

from aztec_tpu.native import cbind
from aztec_tpu.crypto import pedersen as ped
from aztec_tpu.crypto import schnorr as sch
from aztec_tpu.crypto.keccak import keccak256 as py_keccak


def test_hashes_match_python():
    for data in (b"", b"a", b"hello world", bytes(range(256)) * 3):
        assert cbind.blake2s(data) == hashlib.blake2s(data).digest()
        assert cbind.keccak256(data) == py_keccak(data)


def test_blake2s_to_field():
    data = b"abcdefg"
    h = int.from_bytes(hashlib.blake2s(data).digest(), "big")
    assert cbind.blake2s_to_field(data) == h % ped.P


def test_generators_match_python():
    for idx in (0, 1, 2, 7):
        assert cbind.get_generator(idx) == ped.get_generator(idx)


def test_compress_fields_matches_python():
    cases = [(1, 2), (0, 5), (ped.P - 1, ped.P - 2), (12345, 678910)]
    for left, right in cases:
        assert cbind.compress_fields(left, right) == ped.compress_native(
            left, right)


def test_compress_many_and_commit():
    vals = [3, 1, 4, 1, 5]
    assert cbind.compress_many(vals, 0) == ped.compress_many(vals, 0)
    assert cbind.commit(vals, 2) == ped.encrypt_native(vals, 2)


def test_buffer_to_field():
    for data in (b"", b"x" * 31, b"y" * 32, bytes(range(100))):
        assert cbind.buffer_to_field(data) == ped.compress_buffer_to_field(data)


def test_fixed_base_scalar_mul():
    for v, nbits, idx in ((5, 32, 0), (0xDEADBEEF, 64, 1), (7, 254, 0)):
        assert cbind.fixed_base_scalar_mul(v, nbits, idx) == \
            ped.fixed_base_scalar_mul(v, nbits, idx)


def test_schnorr_roundtrip_and_cross():
    priv = 0x1234567890ABCDEF1234567890ABCDEF
    msg = b"The quick brown fox"
    pub_c = cbind.compute_public_key(priv)
    assert pub_c == sch.derive_public_key(priv)

    # deterministic nonce: identical signatures from both implementations
    k = 0x5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A
    sig_c = cbind.construct_signature(msg, priv, k)
    sig_py = sch.construct_signature(msg, priv, k=k)
    assert sig_c == sig_py

    # cross-verification both directions
    assert cbind.verify_signature(msg, pub_c, sig_py)
    assert sch.verify_signature(msg, pub_c, sig_c)

    # rejections
    assert not cbind.verify_signature(b"other msg", pub_c, sig_c)
    bad = (sig_c[0], b"\x00" * 32)
    assert not cbind.verify_signature(msg, pub_c, bad)
    off_curve = (pub_c[0], (pub_c[1] + 1) % ped.P)
    assert not cbind.verify_signature(msg, off_curve, sig_c)
