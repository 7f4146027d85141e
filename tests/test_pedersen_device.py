"""Device-batched Pedersen vs the host implementation."""

import numpy as np
import jax.numpy as jnp

from aztec_tpu.crypto import pedersen as pd
from aztec_tpu.crypto.pedersen_device import compress_batch
from aztec_tpu.ff.bn254 import FR_MOD
from aztec_tpu.numeric.bigint import ints_to_limbs, limbs_to_ints


def test_compress_batch_matches_host():
    rng = np.random.default_rng(21)
    lefts = [1, 2, 0xDEADBEEF, int.from_bytes(rng.bytes(31), "big") % FR_MOD]
    rights = [2, 1, 0, int.from_bytes(rng.bytes(31), "big") % FR_MOD]
    L = jnp.asarray(ints_to_limbs(lefts))
    R = jnp.asarray(ints_to_limbs(rights))
    got = limbs_to_ints(np.asarray(compress_batch(L, R, 0)))
    expected = [pd.compress_native(l, r, 0) for l, r in zip(lefts, rights)]
    assert got == expected
