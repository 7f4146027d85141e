"""AES-128 tests against the FIPS-197 known-answer vector."""

from aztec_tpu.crypto import aes128

KEY = bytes.fromhex("000102030405060708090a0b0c0d0e0f")


def test_fips197_block_vector():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    w = aes128._expand_key(KEY)
    ct = aes128._encrypt_block(pt, w)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert aes128._decrypt_block(ct, w) == pt


def test_cbc_roundtrip():
    iv = bytes(range(16))
    data = bytes(range(64))
    ct = aes128.encrypt_cbc(data, KEY, iv)
    assert ct != data
    assert aes128.decrypt_cbc(ct, KEY, iv) == data
