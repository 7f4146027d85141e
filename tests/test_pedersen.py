"""Pedersen hash tests (ref: crypto/pedersen/pedersen.test.cpp)."""

from aztec_tpu.crypto import pedersen as pd


def test_generators_on_curve_and_distinct():
    gens = [pd.get_generator(i) for i in range(8)]
    assert all(pd.g_on_curve(g) for g in gens)
    assert len(set(gens)) == len(gens)


def test_fixed_base_scalar_mul_matches_naive():
    """ref test: fixed_base_scalar_mul<128>(123, 0) == 123 * G_0."""
    assert pd.fixed_base_scalar_mul(123, 128, 0) == pd.g_mul(123, pd.get_generator(0))
    k = 0xA5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A
    assert pd.fixed_base_scalar_mul(k, 128, 2) == pd.g_mul(k, pd.get_generator(2))


def test_compress_deterministic_and_injective_smoke():
    h1 = pd.compress_native(1, 2)
    h2 = pd.compress_native(2, 1)
    assert h1 == pd.compress_native(1, 2)
    assert h1 != h2
    assert pd.compress_native(1, 2, hash_index=4) != h1


def test_hash_single_on_curve():
    pt = pd.hash_single(123456789, 0)
    assert pd.g_on_curve(pt)
