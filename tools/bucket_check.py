#!/usr/bin/env python
"""Bit-exactness check: fused bucket-phase kernel vs the XLA composition.

Compares msm/bucket_pallas.bucket_phase against msm/pippenger._bucket_phase
on random Jacobian buckets (with empty buckets mixed in) after
normalization (the two paths use different addition orders, so projective
representatives differ while the group element must not), plus a host
golden value.

  AZTEC_PALLAS=interpret JAX_PLATFORMS=cpu python tools/bucket_check.py 2048
  python tools/bucket_check.py 65536          # on the real TPU
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aztec_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    nbuckets = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

    from aztec_tpu.curves import golden
    from aztec_tpu.curves.group_ops import JacobianOps
    from aztec_tpu.curves.io import jacobian_to_host
    from aztec_tpu.curves.spec import BN254_G1
    from aztec_tpu.msm import bucket_pallas
    from aztec_tpu.msm.pippenger import _bucket_phase
    from aztec_tpu.numeric.bigint import ints_to_limbs
    from aztec_tpu.ff import limb

    gc = golden.GoldenCurve(BN254_G1)
    G = (BN254_G1.gen_x, BN254_G1.gen_y)
    rng = np.random.default_rng(3)
    empty = rng.random(nbuckets) < 0.25

    # bucket j = ks[j] * G (or infinity); host expectation via one scalar:
    # W = sum_j j * ks[j] * G
    xs, ys, zs, ks = [], [], [], []
    cur, k = G, 1
    expect_scalar = 0
    for j in range(nbuckets):
        if empty[j]:
            xs.append(0)
            ys.append(0)
            zs.append(0)
        else:
            xs.append(cur[0])
            ys.append(cur[1])
            zs.append(1)
            expect_scalar = (expect_scalar + j * k) % BN254_G1.order
            cur = gc.add(cur, G)
            k += 1
    expect = gc.mul(expect_scalar, G) if expect_scalar else None

    f = BN254_G1.field
    X = limb.to_mont(jnp.asarray(ints_to_limbs(xs)), f)
    Y = limb.to_mont(jnp.asarray(ints_to_limbs(ys)), f)
    Z = limb.to_mont(jnp.asarray(ints_to_limbs(zs)), f)
    buckets = (X, Y, Z)

    ops = JacobianOps(BN254_G1)

    Wf = bucket_pallas.bucket_phase(buckets, nbuckets, f, BN254_G1.b)
    assert Wf is not None, "shape unsupported"
    got_f = jacobian_to_host(ops.c2j(Wf), BN254_G1)[0]

    Wx = _bucket_phase(ops, ops.j2c(buckets), nbuckets, 64)
    got_x = jacobian_to_host(ops.c2j(Wx), BN254_G1)[0]

    print("fused :", got_f)
    print("xla   :", got_x)
    print("host  :", expect)
    assert got_f == got_x == expect, "MISMATCH"
    print("BUCKET PHASE OK", nbuckets)


if __name__ == "__main__":
    main()
