"""Schnorr signature tests (ref: crypto/schnorr/schnorr.test.cpp)."""

from aztec_tpu.crypto import schnorr


def test_sign_verify_roundtrip():
    priv = 0x1234567890ABCDEF1234567890ABCDEF
    pub = schnorr.derive_public_key(priv)
    sig = schnorr.construct_signature(b"The quick brown fox", priv)
    assert schnorr.verify_signature(b"The quick brown fox", pub, sig)


def test_rejects_tampering():
    priv = 42
    pub = schnorr.derive_public_key(priv)
    sig = schnorr.construct_signature(b"msg", priv, k=999)
    assert not schnorr.verify_signature(b"msh", pub, sig)
    bad_e = (sig[0], bytes([sig[1][0] ^ 1]) + sig[1][1:])
    assert not schnorr.verify_signature(b"msg", pub, bad_e)
    bad_s = (bytes([sig[0][0] ^ 1]) + sig[0][1:], sig[1])
    assert not schnorr.verify_signature(b"msg", pub, bad_s)
    other_pub = schnorr.derive_public_key(43)
    assert not schnorr.verify_signature(b"msg", other_pub, sig)
