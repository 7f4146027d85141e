"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: the TPU build adds its own multi-chip test story)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from aztec_tpu.ff import FR, limb
from aztec_tpu.ff.bn254 import FR_MOD
from aztec_tpu.numeric.bigint import ints_to_limbs, limbs_to_ints
from aztec_tpu.poly.domain import EvaluationDomain
from aztec_tpu.poly import fft_ops as pfft


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), axis_names=("dp",))


def test_sharded_coset_fft_matches_single_device():
    from aztec_tpu.parallel.sharded_fft import sharded_coset_fft

    mesh = _mesh(8)
    N = 128  # 8^2 | 128
    rng = np.random.default_rng(5)
    vals = [int.from_bytes(rng.bytes(32), "little") % FR_MOD for i in range(N)]
    coeffs = limb.to_mont(jnp.asarray(ints_to_limbs(vals)), FR)
    dom = EvaluationDomain(N)

    expected = pfft.coset_fft(coeffs, dom)
    got = sharded_coset_fft(mesh, "dp", coeffs, dom)
    assert limbs_to_ints(np.asarray(limb.from_mont(got, FR))) == limbs_to_ints(
        np.asarray(limb.from_mont(expected, FR))
    )


def test_sharded_msm_matches_host():
    from aztec_tpu.parallel.sharded_msm import sharded_msm
    from aztec_tpu.msm.pippenger import MSMConfig
    from aztec_tpu.curves import group
    from aztec_tpu.curves.spec import BN254_G1
    from aztec_tpu.curves.pairing import g1_msm, g1_mul

    mesh = _mesh(8)
    n = 8 * 16
    tau = 0xFACE0FF
    taus = [pow(tau, i, FR_MOD) for i in range(n)]
    pts = [g1_mul(t, (1, 2)) for t in taus]
    fq = BN254_G1.field
    X = limb.to_mont(jnp.asarray(ints_to_limbs([p[0] for p in pts])), fq)
    Y = limb.to_mont(jnp.asarray(ints_to_limbs([p[1] for p in pts])), fq)
    rng = np.random.default_rng(6)
    svals = [int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(n)]
    scalars = jnp.asarray(ints_to_limbs(svals))

    out = sharded_msm(mesh, "dp", (X, Y), scalars, BN254_G1,
                      MSMConfig(c=4, block=16, bucket_block=4))
    x, y, inf = group.to_affine(out, fq)
    expected = g1_msm(list(zip(svals, pts)))
    got = (
        limbs_to_ints(np.asarray(limb.from_mont(x, fq)))[0],
        limbs_to_ints(np.asarray(limb.from_mont(y, fq)))[0],
    )
    assert not bool(np.asarray(inf)[0])
    assert got == expected
