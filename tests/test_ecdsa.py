"""ECDSA tests (ref: crypto/ecdsa/ecdsa.test.cpp)."""

from aztec_tpu.crypto import ecdsa


def test_sign_verify_k1_and_r1():
    for curve in (ecdsa.SECP256K1, ecdsa.SECP256R1):
        priv = 0x1234567890DEADBEEF1234567890DEADBEEF
        pub = ecdsa.derive_public_key(priv, curve)
        sig = ecdsa.sign(b"ecdsa message", priv, curve)
        assert ecdsa.verify(b"ecdsa message", pub, sig, curve)
        assert not ecdsa.verify(b"ecdsa messagf", pub, sig, curve)
        assert not ecdsa.verify(b"ecdsa message", pub, (sig[0], sig[1] ^ 1), curve)


def test_known_secp256k1_generator_order():
    c = ecdsa.SECP256K1
    assert ecdsa._mul(c, c.n, (c.gx, c.gy)) is None
