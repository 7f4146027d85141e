"""Group-law tests: device Jacobian kernels vs the golden affine oracle.

Mirrors the reference's g1 tests (ecc/curves/bn254/g1.test.cpp): random
add/double/mixed-add consistency, infinity and cancellation edge cases.
"""

import random

import numpy as np
import jax.numpy as jnp

from aztec_tpu.curves import group, golden
from aztec_tpu.curves.spec import BN254_G1, GRUMPKIN_G1
from aztec_tpu.curves.io import affine_to_device, jacobian_to_host

rng = random.Random(7)


def setup_points(curve_g, n):
    """n points as i*G + random offsets (cheap incremental generation)."""
    pts = []
    P = curve_g.gen
    for _ in range(n):
        pts.append(P)
        P = curve_g.add(P, curve_g.gen)
    return pts


def test_dbl_add_vs_golden_bn254():
    g = golden.BN254
    pts = setup_points(g, 9)
    X, Y = affine_to_device(pts, BN254_G1)
    P = group.from_affine((X, Y), BN254_G1.field)

    got = jacobian_to_host(group.dbl(P, BN254_G1.field), BN254_G1)
    assert got == [g.dbl(p) for p in pts]

    # P[i] + P[(i+3) mod n]  — distinct points, safe for add_unsafe
    Q = tuple(jnp.roll(c, -3, axis=1) for c in P)
    got = jacobian_to_host(group.add_unsafe(P, Q, BN254_G1.field), BN254_G1)
    expect = [g.add(pts[i], pts[(i + 3) % len(pts)]) for i in range(len(pts))]
    assert got == expect

    got = jacobian_to_host(group.add_complete(P, Q, BN254_G1.field), BN254_G1)
    assert got == expect


def test_add_complete_edge_cases():
    g = golden.BN254
    spec = BN254_G1.field
    pts = setup_points(g, 4)
    X, Y = affine_to_device(pts, BN254_G1)
    P = group.from_affine((X, Y), spec)
    inf = group.infinity(spec, (4,))

    # P + inf = P ; inf + P = P ; inf + inf = inf
    assert jacobian_to_host(group.add_complete(P, inf, spec), BN254_G1) == pts
    assert jacobian_to_host(group.add_complete(inf, P, spec), BN254_G1) == pts
    assert jacobian_to_host(group.add_complete(inf, inf, spec), BN254_G1) == [None] * 4
    # unsafe also handles infinities
    assert jacobian_to_host(group.add_unsafe(P, inf, spec), BN254_G1) == pts

    # P + P = 2P (complete only)
    got = jacobian_to_host(group.add_complete(P, P, spec), BN254_G1)
    assert got == [g.dbl(p) for p in pts]

    # P + (-P) = inf
    N = group.neg(P, spec)
    got = jacobian_to_host(group.add_complete(P, N, spec), BN254_G1)
    assert got == [None] * 4


def test_mixed_add():
    g = golden.BN254
    spec = BN254_G1.field
    pts = setup_points(g, 8)
    X, Y = affine_to_device(pts, BN254_G1)
    P = group.from_affine((X, Y), spec)
    Qa = (jnp.roll(X, -1, axis=1), jnp.roll(Y, -1, axis=1))
    got = jacobian_to_host(group.mixed_add_unsafe(P, Qa, spec), BN254_G1)
    expect = [g.add(pts[i], pts[(i + 1) % 8]) for i in range(8)]
    assert got == expect

    # infinity + affine Q = Q
    inf = group.infinity(spec, (8,))
    got = jacobian_to_host(group.mixed_add_unsafe(inf, Qa, spec), BN254_G1)
    assert got == [pts[(i + 1) % 8] for i in range(8)]


def test_grumpkin_ops():
    g = golden.GRUMPKIN
    spec = GRUMPKIN_G1.field
    assert g.is_on_curve(g.gen)
    pts = setup_points(g, 5)
    X, Y = affine_to_device(pts, GRUMPKIN_G1)
    P = group.from_affine((X, Y), spec)
    got = jacobian_to_host(group.dbl(P, spec), GRUMPKIN_G1)
    assert got == [g.dbl(p) for p in pts]
    assert bool(
        np.all(np.asarray(group.is_on_curve_affine((X, Y), spec, GRUMPKIN_G1.b)))
    )


def test_on_curve_check():
    pts = setup_points(golden.BN254, 3)
    X, Y = affine_to_device(pts, BN254_G1)
    ok = group.is_on_curve_affine((X, Y), BN254_G1.field, 3)
    assert bool(np.all(np.asarray(ok)))
    bad = (X, jnp.roll(Y, 1, axis=1))
    ok = group.is_on_curve_affine(bad, BN254_G1.field, 3)
    assert not bool(np.any(np.asarray(ok)))
