"""Pallas mont_mul kernel vs the jnp reference (TPU only; skips on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aztec_tpu.ff import FR, limb
from aztec_tpu.ff.bn254 import FR_MOD
from aztec_tpu.numeric.bigint import ints_to_limbs, limbs_to_ints


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU-only kernel")
def test_pallas_mont_mul_matches_jnp():
    from aztec_tpu.ff import limb_pallas

    rng = np.random.default_rng(11)
    n = 1024
    avals = [int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(n)]
    bvals = [int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(n)]
    a = limb.to_mont(jnp.asarray(ints_to_limbs(avals)), FR)
    b = limb.to_mont(jnp.asarray(ints_to_limbs(bvals)), FR)

    ref = limb.mont_mul(a, b, FR)
    got = limb_pallas.mont_mul(a, b, FR)
    assert limbs_to_ints(np.asarray(got)) == limbs_to_ints(np.asarray(ref))
