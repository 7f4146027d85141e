"""Elliptic widget kernel test (ref: elliptic_widget.hpp:8-80).

The gate validates (x_3, y_3) = (x_1, y_1) + (beta * x_2, sign * y_2) on
the embedded (grumpkin) curve, with beta a cube root of unity folded into
the selectors.  No composer instantiates the widget (same as the
reference snapshot), so the kernel is verified directly against host
curve arithmetic.
"""

import random

import jax.numpy as jnp

from aztec_tpu.ff.bn254 import FR_MOD
from aztec_tpu.msm import glv
from aztec_tpu.curves.spec import GRUMPKIN_G1
from aztec_tpu.plonk import kernels
from aztec_tpu.plonk.proving_key import fr_mont, ints_to_mont
from aztec_tpu.numeric.bigint import limbs_to_ints
import numpy as np

M = FR_MOD
rng = random.Random(99)


def _add(P, Q):
    x1, y1 = P
    x2, y2 = Q
    lam = (y2 - y1) * pow(x2 - x1, -1, M) % M
    x3 = (lam * lam - x1 - x2) % M
    return (x3, (lam * (x1 - x3) - y1) % M)


def test_elliptic_identity_kernel():
    beta = glv.glv_params(GRUMPKIN_G1)["beta"]
    G = (GRUMPKIN_G1.gen_x, GRUMPKIN_G1.gen_y)
    P1 = glv._host_ec_mul(rng.randrange(2, 1 << 64), G, M, GRUMPKIN_G1.b)
    P2 = glv._host_ec_mul(rng.randrange(2, 1 << 64), G, M, GRUMPKIN_G1.b)

    for sign in (1, -1):
        P2e = (beta * P2[0] % M, sign * P2[1] % M)
        P3 = _add(P1, P2e)

        rows = 4
        w = [[0] * rows for _ in range(4)]  # w[col][row]
        w[1][0], w[2][0] = P1          # x_1=w_2, y_1=w_3 at row 0
        w[0][1], w[3][1] = P2[0], P2[1]  # x_2=w_1, y_2=w_4 at row 1
        w[1][1], w[2][1] = P3          # x_3=w_2, y_3=w_3 at row 1

        wffts = jnp.stack([ints_to_mont(col) for col in w], axis=1)
        qb = ints_to_mont([beta, 0, 0, 0])
        qbs = ints_to_mont([beta * beta % M, 0, 0, 0])
        qs = ints_to_mont([sign % M, 0, 0, 0])
        qe = ints_to_mont([1, 0, 0, 0])
        alpha = fr_mont(rng.randrange(1, M))[:, None]
        alpha2 = fr_mont(rng.randrange(1, M))[:, None]

        out = kernels.elliptic_identity(wffts, qb, qbs, qs, qe,
                                        alpha, alpha2)
        vals = limbs_to_ints(np.asarray(out))
        assert vals[0] == 0, f"gate row not satisfied (sign {sign})"
        assert all(v == 0 for v in vals[1:])  # q_elliptic masks the rest

        # corrupt x_3 -> identity breaks
        w[1][1] = (w[1][1] + 1) % M
        wbad = jnp.stack([ints_to_mont(col) for col in w], axis=1)
        out_bad = kernels.elliptic_identity(wbad, qb, qbs, qs, qe,
                                            alpha, alpha2)
        assert limbs_to_ints(np.asarray(out_bad))[0] != 0
        w[1][1] = (w[1][1] - 1) % M
