"""SRS transcript IO round-trip (ref: srs/io.cpp + Ignition format)."""

import os

import numpy as np

from aztec_tpu.srs import io as srs_io
from aztec_tpu.curves.pairing import g1_mul
from aztec_tpu.curves.tower import G2_GEN, g2_mul
from aztec_tpu.numeric.bigint import ints_to_limbs, limbs_to_ints
from aztec_tpu.ff.bn254 import FR_MOD


def test_transcript_roundtrip(tmp_path):
    tau = 0x1234567
    n = 8
    taus = [pow(tau, i, FR_MOD) for i in range(n)]
    pts = [g1_mul(t, (1, 2)) for t in taus]
    xs = ints_to_limbs([p[0] for p in pts])
    ys = ints_to_limbs([p[1] for p in pts])
    g2 = [G2_GEN, g2_mul(tau, G2_GEN)]

    path = os.path.join(tmp_path, "transcript00.dat")
    srs_io.write_transcript(path, xs, ys, g2)
    man, rx, ry, g2b = srs_io.read_transcript(path)
    assert man.num_g1_points == n and man.num_g2_points == 2
    assert limbs_to_ints(rx) == [p[0] for p in pts]
    assert limbs_to_ints(ry) == [p[1] for p in pts]
    assert srs_io.read_g2_points(g2b) == g2


def test_file_reference_string_factory(tmp_path):
    from aztec_tpu.srs.reference_string import (
        FileReferenceStringFactory,
        write_dev_srs,
    )
    from aztec_tpu.curves import group
    from aztec_tpu.curves.spec import BN254_G1
    from aztec_tpu.numeric.bigint import limbs_to_ints
    from aztec_tpu.ff import limb

    tau = write_dev_srs(str(tmp_path), 4, tau=0xBEEF)
    fac = FileReferenceStringFactory(str(tmp_path))
    prs = fac.get_prover_srs(5)
    X, Y = prs.get_monomials(5)
    fq = BN254_G1.field
    ok = group.is_on_curve_affine((X, Y), fq, 3)
    assert bool(np.all(np.asarray(ok)))
    # monomial 0 is the generator; monomial i is tau^i * G
    xs = limbs_to_ints(np.asarray(limb.from_mont(X, fq)))
    assert xs[0] == 1
    assert (xs[1], xs[2]) == (g1_mul(tau, (1, 2))[0],
                              g1_mul(tau * tau % FR_MOD, (1, 2))[0])
    vrs = fac.get_verifier_srs()
    assert vrs.g2_x == g2_mul(tau, G2_GEN)
