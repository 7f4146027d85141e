"""Fused Pallas kernels vs the jnp limb path (TPU only; skips on CPU).

The full sweep (all group formulas, infinity lanes, timing) lives in
tools/pallas_check.py; this is the in-suite smoke: bit-exactness of the
fused mont_mul and mixed add on real Montgomery-form inputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aztec_tpu.ff import FR, limb
from aztec_tpu.ff.bn254 import FR_MOD
from aztec_tpu.numeric.bigint import ints_to_limbs, limbs_to_ints

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="TPU-only kernels"
)


def _rand_mont(rng, n):
    vals = [int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(n)]
    return limb.to_mont(jnp.asarray(ints_to_limbs(vals)), FR)


def test_pallas_mont_mul_matches_jnp():
    from aztec_tpu.ff import pallas_field

    rng = np.random.default_rng(11)
    n = 1024
    a = _rand_mont(rng, n)
    b = _rand_mont(rng, n)
    ref = limb.mont_mul(a, b, FR)
    got = pallas_field.mont_mul(a, b, FR)
    assert limbs_to_ints(np.asarray(got)) == limbs_to_ints(np.asarray(ref))


def test_pallas_mont_mul_odd_width_pad():
    from aztec_tpu.ff import pallas_field

    rng = np.random.default_rng(12)
    n = 777  # forces the pad-to-block path
    a = _rand_mont(rng, n)
    b = _rand_mont(rng, n)
    ref = limb.mont_mul(a, b, FR)
    got = pallas_field.mont_mul(a, b, FR)
    assert limbs_to_ints(np.asarray(got)) == limbs_to_ints(np.asarray(ref))


def test_pallas_mixed_add_matches_group():
    from aztec_tpu.curves import group, group_pallas
    from aztec_tpu.curves.spec import BN254_G1

    spec = BN254_G1.field
    rng = np.random.default_rng(13)
    n = 2048
    planes = []
    for _ in range(5):
        x = rng.integers(0, 1 << 16, (16, n), dtype=np.uint32)
        x[15] &= 0x2FFF  # < p: same canonical domain as real coordinates
        planes.append(jnp.asarray(x))
    X1, Y1, Z1, X2, Y2 = planes
    Z1 = Z1.at[:, : n // 4].set(0)  # infinity lanes

    ref = group.mixed_add_unsafe((X1, Y1, Z1), (X2, Y2), spec)
    got = group_pallas.mixed_add_unsafe((X1, Y1, Z1), (X2, Y2), spec)
    for r, g in zip(ref, got):
        assert bool(jnp.array_equal(r, g))
