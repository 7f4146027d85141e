"""Pippenger MSM tests.

Engine logic (sorting / rake scan / carries / buckets) is verified against a
mock integer group (Z_m, +) where every add is exact — this catches indexing
bugs in milliseconds.  The EC instantiation is then checked on random,
pairwise-independent points (the pippenger_unsafe contract of the reference,
scalar_multiplication.cpp:908-923; structured points like i*G are
deliberately NOT used since their partial sums collide).
"""

import random

import numpy as np
import jax.numpy as jnp

from aztec_tpu.curves import golden
from aztec_tpu.curves.group_ops import IntModOps
from aztec_tpu.curves.spec import BN254_G1
from aztec_tpu.curves.io import affine_to_device, jacobian_to_host
from aztec_tpu.msm import msm, MSMConfig
from aztec_tpu.msm.pippenger import msm_engine
from aztec_tpu.numeric import ints_to_limbs

rng = random.Random(31337)
M = 1_000_003


def run_mock(n, scalars, vals, c, block, bucket_block):
    ops = IntModOps(M)
    sc = jnp.asarray(ints_to_limbs(scalars))
    pts = (jnp.asarray(np.array(vals, np.uint32)[None, :]),)
    pad = (-n) % block
    if pad or n // block < 2:
        extra = pad if n // block >= 2 else pad + block
        sc = jnp.concatenate([sc, jnp.zeros((16, extra), jnp.uint32)], axis=1)
        pts = (jnp.concatenate([pts[0], jnp.ones((1, extra), jnp.uint32)], axis=1),)
        n += extra
    out = msm_engine(ops, pts, sc, n, c, block, bucket_block)
    got = int(np.asarray(out[0])[0])
    expect = sum(k * v for k, v in zip(scalars, vals)) % M
    assert got == expect, (n, c, block, bucket_block)


def test_engine_random():
    for c, block, bb in [(4, 16, 4), (8, 32, 16), (16, 32, 64), (16, 64, 64)]:
        n = 4 * block + 7
        scalars = [rng.randrange(golden.BN254.order) for _ in range(n)]
        vals = [rng.randrange(1, M) for _ in range(n)]
        run_mock(n, scalars, vals, c, block, bb)


def test_engine_adversarial_digits():
    c, block, bb = 8, 16, 16
    n = 8 * block
    cases = [
        [0] * n,                                   # all zero
        [golden.BN254.order - 1] * n,              # all max, equal
        [1] * n,                                   # digit 1 everywhere
        [rng.choice([0, 5, 5 << 8, 0xFF]) for _ in range(n)],  # long runs
        [(i % 3) * 0x0101010101010101 for i in range(n)],      # interleaved
    ]
    for scalars in cases:
        vals = [rng.randrange(1, M) for _ in range(n)]
        run_mock(n, scalars, vals, c, block, bb)


def test_engine_segment_spanning_blocks():
    # one digit dominating => segments span many blocks
    c, block, bb = 4, 16, 4
    n = 6 * block
    scalars = [7] * (n - 5) + [rng.randrange(golden.BN254.order) for _ in range(5)]
    vals = [rng.randrange(1, M) for _ in range(n)]
    run_mock(n, scalars, vals, c, block, bb)


def _random_points(n):
    g = golden.BN254
    ks = [rng.randrange(1, g.order) for _ in range(n)]
    return [g.mul(k, g.gen) for k in ks], ks


def test_msm_ec_small():
    g = golden.BN254
    n = 70
    pts, _ = _random_points(n)
    scalars = [rng.randrange(g.order) for _ in range(n)]
    scalars[3] = 0
    scalars[10] = 1
    X, Y = affine_to_device(pts, BN254_G1)
    sc = jnp.asarray(ints_to_limbs(scalars))
    result = msm((X, Y), sc, BN254_G1, MSMConfig(c=4, block=16, bucket_block=4))
    got = jacobian_to_host(result, BN254_G1)[0]
    expect = g.msm(scalars, pts)
    assert got == expect


import os
import pytest


@pytest.mark.skipif(os.environ.get("AZTEC_HEAVY") != "1",
                    reason="c=16 compiles a 2^16-bucket module (~30 min on "
                           "this 1-core CPU); set AZTEC_HEAVY=1")
def test_msm_ec_c16():
    g = golden.BN254
    n = 128
    pts, _ = _random_points(n)
    scalars = [rng.randrange(g.order) for _ in range(n)]
    X, Y = affine_to_device(pts, BN254_G1)
    sc = jnp.asarray(ints_to_limbs(scalars))
    result = msm((X, Y), sc, BN254_G1, MSMConfig(c=16, block=32, bucket_block=64))
    got = jacobian_to_host(result, BN254_G1)[0]
    expect = g.msm(scalars, pts)
    assert got == expect


# ----------------------------- GLV ----------------------------------------

def test_glv_split_device():
    """Device split satisfies k == s1*k1 + lam*s2*k2 (mod r), |k_i| < 2^128,
    for random + edge scalars, on both cycle curves."""
    from aztec_tpu.msm import glv
    from aztec_tpu.curves.spec import GRUMPKIN_G1
    from aztec_tpu.numeric.bigint import limbs_to_ints

    for curve in (BN254_G1, GRUMPKIN_G1):
        P = glv.glv_params(curve)
        assert P is not None
        r = curve.order
        ks = [rng.randrange(r) for _ in range(29)] + [0, 1, r - 1, r // 2]
        sc = jnp.asarray(ints_to_limbs(ks))
        k1a, n1, k2a, n2 = glv.glv_split(sc, curve)
        z = jnp.zeros((8, len(ks)), jnp.uint32)
        k1v = limbs_to_ints(np.asarray(jnp.concatenate([k1a, z], 0)))
        k2v = limbs_to_ints(np.asarray(jnp.concatenate([k2a, z], 0)))
        n1v, n2v = np.asarray(n1), np.asarray(n2)
        for i, k in enumerate(ks):
            s1 = -1 if n1v[i] else 1
            s2 = -1 if n2v[i] else 1
            assert (s1 * k1v[i] + P["lam"] * s2 * k2v[i] - k) % r == 0
            assert max(k1v[i], k2v[i]).bit_length() <= 128


def test_msm_ec_glv():
    """GLV path (half rounds, doubled table) matches the straight MSM."""
    g = golden.BN254
    n = 64
    pts, _ = _random_points(n)
    scalars = [rng.randrange(g.order) for _ in range(n)]
    scalars[0] = 0
    scalars[7] = 1
    X, Y = affine_to_device(pts, BN254_G1)
    sc = jnp.asarray(ints_to_limbs(scalars))
    result = msm((X, Y), sc, BN254_G1,
                 MSMConfig(c=4, block=16, bucket_block=4, glv=True))
    got = jacobian_to_host(result, BN254_G1)[0]
    expect = g.msm(scalars, pts)
    assert got == expect
