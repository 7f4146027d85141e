"""Prover/verifier reference strings (ref: plonk/reference_string/).

- ProverReferenceString: the G1 monomials [x^i]_1 as device-resident affine
  Montgomery limb planes (the reference's pippenger point table; GLV table
  doubling happens inside the MSM engine when enabled).
- VerifierReferenceString: [x]_2 (and [1]_2) as host Fq2 ints for the O(1)
  pairing check.
- FakeReferenceStringFactory: synthesizes tau^i * G entirely on device
  (fixed-base batch mul) from a known tau — the dev/test SRS.
- FileReferenceStringFactory: Ignition transcript .dat files.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..ff import FR, limb
from ..ff.bn254 import FR_MOD
from ..numeric.bigint import ints_to_limbs
from ..curves.spec import BN254_G1
from ..curves import group
from ..curves.fixed_base import fixed_base_mul
from ..curves import tower
from . import io as srs_io


class ProverReferenceString:
    def __init__(self, X, Y, size: int):
        self.X = X  # (L, size) Montgomery Fq limb planes
        self.Y = Y
        self.size = size

    def get_monomials(self, n: int):
        assert n <= self.size, f"SRS too small: {n} > {self.size}"
        return self.X[:, :n], self.Y[:, :n]


class VerifierReferenceString:
    def __init__(self, g2_x, g2_gen=tower.G2_GEN):
        self.g2_x = g2_x   # [x]_2 affine Fq2 pair
        self.g2_gen = g2_gen


class FakeReferenceStringFactory:
    """SRS from a known tau (dev/test only, like the reference's local
    srs_db fixtures). tau is remembered so tests can check KZG identities
    without a pairing."""

    def __init__(self, tau: int | None = None):
        self.tau = tau if tau is not None else 0xB0B0CAFE12345678DEADBEEF

    def get_prover_srs(self, n: int) -> ProverReferenceString:
        if n <= 512:
            # host path: avoids compiling the device fixed-base kernel for
            # tiny test SRSs (XLA:CPU compile of the window tables is slow)
            from ..curves.pairing import g1_mul

            taus = [1]
            for _ in range(n - 1):
                taus.append(taus[-1] * self.tau % FR_MOD)
            pts = [g1_mul(t, (1, 2)) for t in taus]
            xs = ints_to_limbs([p[0] for p in pts])
            ys = ints_to_limbs([p[1] for p in pts])
            fq = BN254_G1.field
            return ProverReferenceString(
                limb.to_mont(jnp.asarray(xs), fq),
                limb.to_mont(jnp.asarray(ys), fq),
                n,
            )
        cached = self._from_point_cache(n)
        if cached is not None:
            return cached
        taus = [1]
        for _ in range(n - 1):
            taus.append(taus[-1] * self.tau % FR_MOD)
        sc = jnp.asarray(ints_to_limbs(taus))
        P = fixed_base_mul(sc, BN254_G1)
        x, y, inf = group.to_affine(P, BN254_G1.field)
        assert not bool(np.any(np.asarray(inf)))
        return ProverReferenceString(x, y, n)

    def _from_point_cache(self, n: int):
        """Slice the committed bench table (tau^i * G, same dev tau,
        Montgomery uint16 planes) instead of re-deriving up to 2^20
        fixed-base muls on device — the single biggest prover startup
        cost at realistic sizes."""
        import os

        if self.tau != 0xB0B0CAFE12345678DEADBEEF:
            return None
        f = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".bench_cache", "points_2pow20.npz")
        if n > (1 << 20) or not os.path.exists(f):
            return None
        d = np.load(f)
        return ProverReferenceString(
            jnp.asarray(d["X"][:, :n].astype(np.uint32)),
            jnp.asarray(d["Y"][:, :n].astype(np.uint32)), n)

    def get_verifier_srs(self) -> VerifierReferenceString:
        return VerifierReferenceString(tower.g2_mul(self.tau, tower.G2_GEN))


class MemReferenceString(ProverReferenceString):
    pass


def write_dev_srs(srs_dir: str, n: int, tau: int | None = None) -> int:
    """Write an Ignition-layout dev SRS ([tau^1..tau^n]G, g2 = [tau]_2)
    readable by BOTH this framework's and the reference's file readers.
    Returns tau."""
    from ..curves.pairing import g1_mul
    from ..numeric.bigint import ints_to_limbs

    os.makedirs(srs_dir, exist_ok=True)
    tau = tau if tau is not None else 0xB0B0CAFE12345678DEADBEEF
    taus = []
    t = 1
    for _ in range(n):
        t = t * tau % FR_MOD
        taus.append(t)
    pts = [g1_mul(v, (1, 2)) for v in taus]
    srs_io.write_transcript(
        os.path.join(srs_dir, "transcript00.dat"),
        ints_to_limbs([p[0] for p in pts]),
        ints_to_limbs([p[1] for p in pts]),
        [tower.g2_mul(tau, tower.G2_GEN), tower.G2_GEN],
    )
    return tau


class FileReferenceStringFactory:
    """Loads transcript .dat files (Ignition format, srs/io.cpp).

    Layout facts from the reference reader (srs/io.cpp:134-183): monomial 0
    is ALWAYS the group generator (not stored in the file — files hold
    [x^1]G onward), and the verifier's [x]_2 is the FIRST g2 element."""

    def __init__(self, srs_dir: str):
        self.srs_dir = srs_dir

    def get_prover_srs(self, n: int) -> ProverReferenceString:
        from ..numeric.bigint import int_to_limbs

        xs = [int_to_limbs(BN254_G1.gen_x)[:, None]]
        ys = [int_to_limbs(BN254_G1.gen_y)[:, None]]
        got = 1
        i = 0
        while got < n:
            path = os.path.join(self.srs_dir, f"transcript{i:02d}.dat")
            man, x, y, _ = srs_io.read_transcript(path)
            xs.append(x)
            ys.append(y)
            got += x.shape[1]
            i += 1
        X = np.concatenate(xs, axis=1)[:, :n]
        Y = np.concatenate(ys, axis=1)[:, :n]
        return ProverReferenceString(
            limb.to_mont(jnp.asarray(X), BN254_G1.field),
            limb.to_mont(jnp.asarray(Y), BN254_G1.field),
            n,
        )

    def get_verifier_srs(self) -> VerifierReferenceString:
        path = os.path.join(self.srs_dir, "transcript00.dat")
        man, _, _, g2b = srs_io.read_transcript(path)
        pts = srs_io.read_g2_points(g2b)
        return VerifierReferenceString(pts[0])
