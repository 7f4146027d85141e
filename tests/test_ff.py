"""Field-arithmetic unit tests: limb kernels vs pure-Python golden oracle.

Mirrors the reference's field axiom tests (ecc/curves/bn254/fq.test.cpp,
fr.test.cpp): random-element algebra plus known-answer constants.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from aztec_tpu.ff import FQ, FR, limb, golden
from aztec_tpu.ff.bn254 import (
    FR_MOD,
    FQ_MOD,
    FR_PRIMITIVE_ROOT,
    FR_TWO_ADICITY,
    FR_LAMBDA,
    FQ_BETA,
)
from aztec_tpu.numeric import ints_to_limbs, limbs_to_ints

rng = random.Random(1234)


def rand_elems(spec, n):
    return [rng.randrange(spec.modulus) for _ in range(n)]


def dev(vals):
    return jnp.asarray(ints_to_limbs(vals))


def back(arr):
    return limbs_to_ints(np.asarray(arr))


@pytest.mark.parametrize("spec", [FQ, FR], ids=["fq", "fr"])
def test_spec_constants(spec):
    # Montgomery R matches the reference's 2^256 choice; R2 known-answer
    # values are checked for fr in test_known_r_squared.
    assert spec.R == (1 << 256) % spec.modulus
    assert (spec.modulus * (-spec.pprime % (1 << 256))) % (1 << 256) == (
        (1 << 256) - 1
    ) % (1 << 256) + 1 - 1 or (spec.modulus * spec.pprime + 1) % (1 << 256) == 0


def test_known_r_squared():
    # reference fr.hpp:17-20 / fq.hpp:16-19 r_squared constants
    def u64s(*ws):
        v = 0
        for i, w in enumerate(ws):
            v |= w << (64 * i)
        return v

    assert FR.R2 == u64s(
        0x1BB8E645AE216DA7, 0x53FE3AB1E35C59E3, 0x8C49833D53BB8085, 0x216D0B17F4E44A5
    )
    assert FQ.R2 == u64s(
        0xF32CFC5B538AFA89, 0xB5E71911D44501FB, 0x47AB1EFF0A417FF6, 0x06D89F71CAB8351F
    )


@pytest.mark.parametrize("spec", [FQ, FR], ids=["fq", "fr"])
def test_add_sub_mod(spec):
    n = 257
    a = rand_elems(spec, n)
    b = rand_elems(spec, n)
    # stress boundary values
    a[:3] = [0, spec.modulus - 1, spec.modulus - 1]
    b[:3] = [0, spec.modulus - 1, 1]
    da, db = dev(a), dev(b)
    got_add = back(limb.add_mod(da, db, spec))
    got_sub = back(limb.sub_mod(da, db, spec))
    for i in range(n):
        assert got_add[i] == (a[i] + b[i]) % spec.modulus
        assert got_sub[i] == (a[i] - b[i]) % spec.modulus


@pytest.mark.parametrize("spec", [FQ, FR], ids=["fq", "fr"])
def test_mont_mul(spec):
    n = 257
    a = rand_elems(spec, n)
    b = rand_elems(spec, n)
    a[:4] = [0, 1, spec.modulus - 1, spec.R]
    b[:4] = [0, spec.modulus - 1, spec.modulus - 1, spec.R2]
    da, db = dev(a), dev(b)
    got = back(limb.mont_mul(da, db, spec))
    for i in range(n):
        assert got[i] == golden.mont_mul(spec, a[i], b[i]), i


def test_mont_roundtrip():
    spec = FR
    n = 64
    a = rand_elems(spec, n)
    da = dev(a)
    am = limb.to_mont(da, spec)
    assert back(am) == [golden.to_mont(spec, v) for v in a]
    assert back(limb.from_mont(am, spec)) == a


def test_mul_matches_integer_product():
    # to_mont(a)*to_mont(b) -> from_mont = a*b mod p
    spec = FR
    n = 64
    a, b = rand_elems(spec, n), rand_elems(spec, n)
    da = limb.to_mont(dev(a), spec)
    db = limb.to_mont(dev(b), spec)
    got = back(limb.from_mont(limb.mont_mul(da, db, spec), spec))
    assert got == [(x * y) % spec.modulus for x, y in zip(a, b)]


def test_inv_and_pow():
    spec = FR
    n = 33
    a = rand_elems(spec, n)
    a[0] = 0  # 0 -> 0
    am = limb.to_mont(dev(a), spec)
    got = back(limb.from_mont(limb.inv_mont(am, spec), spec))
    for i, v in enumerate(a):
        assert got[i] == (pow(v, -1, spec.modulus) if v else 0)


def test_batch_inv():
    spec = FR
    n = 40
    a = rand_elems(spec, n)
    a[7] = 0
    a[23] = 0
    am = limb.to_mont(dev(a), spec)
    got = back(limb.from_mont(limb.batch_inv_mont(am, spec, axis=-1), spec))
    for i, v in enumerate(a):
        assert got[i] == (pow(v, -1, spec.modulus) if v else 0)


def test_primitive_root_orders():
    # root^(2^28) = 1, root^(2^27) = -1
    assert pow(FR_PRIMITIVE_ROOT, 1 << FR_TWO_ADICITY, FR_MOD) == 1
    assert pow(FR_PRIMITIVE_ROOT, 1 << (FR_TWO_ADICITY - 1), FR_MOD) == FR_MOD - 1


def test_endo_roots():
    assert pow(FR_LAMBDA, 3, FR_MOD) == 1 and FR_LAMBDA != 1
    assert pow(FQ_BETA, 3, FQ_MOD) == 1 and FQ_BETA != 1


def test_canon_edge_cases():
    # all-0xffffffff columns exercise maximal carries
    cols = jnp.full((16, 3), 0xFFFFFFFF, jnp.uint32)
    out, co = limb.canon(cols)
    val = 0
    for k in range(16):
        val += int(np.asarray(out)[k, 0]) << (16 * k)
    val += int(np.asarray(co)[0]) << 256
    expect = sum(0xFFFFFFFF << (16 * k) for k in range(16))
    assert val == expect
