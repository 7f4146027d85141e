"""Proving / verification keys: device-resident polynomial stores.

TPU-native analog of the reference proving_key (plonk/proof_system/
proving_key/proving_key.cpp): per polynomial we keep the monomial form and the
4n coset-FFT form as Montgomery limb planes resident on device across all
prover rounds (the reference's persistent wire_ffts/constraint_selector_ffts
caches), plus the tables the fused quotient kernel needs (L_1 coset FFT,
evaluation points, 1/Z*_H scale).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ff import FR, limb
from ..ff.bn254 import FR_MOD
from ..numeric.bigint import ints_to_limbs, int_to_limbs
from ..poly.domain import EvaluationDomain, powers_table
from ..poly import fft_ops as pfft
from ..curves import group
from ..curves.spec import BN254_G1
from ..msm.pippenger import msm
from . import kernels
from .manifests import StandardSettings, STANDARD


def fr_mont(v: int) -> jnp.ndarray:
    return jnp.asarray(int_to_limbs(v % FR_MOD * FR.R % FR_MOD))


def ints_to_mont(vals) -> jnp.ndarray:
    """Canonical int list -> (L, n) Montgomery planes (host -> device)."""
    return jnp.asarray(ints_to_limbs([v * FR.R % FR_MOD for v in vals]))


@dataclasses.dataclass
class PolyStore:
    monomial: jnp.ndarray              # (L, n)
    fft: Optional[jnp.ndarray] = None  # (L, 4n) coset evaluations
    lagrange: Optional[jnp.ndarray] = None


class ProvingKey:
    """ref: plonk/proof_system/proving_key/proving_key.hpp."""

    def __init__(self, n: int, num_public_inputs: int, srs,
                 settings: StandardSettings = STANDARD):
        self.n = n
        self.num_public_inputs = num_public_inputs
        self.settings = settings
        self.small_domain = EvaluationDomain(n)
        self.large_domain = EvaluationDomain(4 * n)
        self.srs = srs  # ProverReferenceString with >= n+1 monomials
        self.selectors: Dict[str, PolyStore] = {}
        self.sigmas: Dict[str, PolyStore] = {}
        # full omega powers for the grand product + sigma construction
        self.omega_pows = powers_table(fr_mont(self.small_domain.root), n, FR)
        # L_1 on the 4n coset
        l1_lagrange = jnp.zeros((FR.nlimbs, n), jnp.uint32)
        l1_lagrange = l1_lagrange.at[:, 0].set(fr_mont(1))
        l1_mono = pfft.ifft(l1_lagrange, self.small_domain)
        self.l1_fft = pfft.coset_fft(
            self._extend(l1_mono), self.large_domain
        )
        self.coset_pts, self.vanish_scale = kernels.vanishing_scale_table(
            n,
            self.large_domain.root,
            self.small_domain.root,
            self.small_domain.generator,
            settings.num_roots_cut_out_of_vanishing_polynomial,
        )

    def _extend(self, mono: jnp.ndarray) -> jnp.ndarray:
        """Zero-pad (L, n) monomial coefficients to (L, 4n)."""
        L, m = mono.shape
        pad = jnp.zeros((L, 4 * self.n - m), jnp.uint32)
        return jnp.concatenate([mono, pad], axis=1)

    def add_polynomial(self, kind: str, name: str, lagrange: jnp.ndarray,
                       keep_lagrange: bool = False):
        """lagrange (L, n) Montgomery -> stores monomial + 4n coset fft."""
        mono = pfft.ifft(lagrange, self.small_domain)
        f = pfft.coset_fft(self._extend(mono), self.large_domain)
        store = PolyStore(monomial=mono, fft=f,
                          lagrange=lagrange if keep_lagrange else None)
        (self.selectors if kind == "selector" else self.sigmas)[name] = store

    # -- commitments ---------------------------------------------------------
    def commit(self, mono: jnp.ndarray):
        """MSM of Montgomery-form coefficients against SRS monomials.

        Returns host affine ints (x, y) or None for infinity
        (ref: kate_commitment_scheme.cpp:14-23 + work_queue.hpp:208-243).
        """
        m = mono.shape[1]
        X, Y = self.srs.get_monomials(m)
        scalars = limb.from_mont(mono, FR)
        P = msm((X, Y), scalars, BN254_G1)
        x, y, inf = group.to_affine(P, BN254_G1.field)
        if bool(np.asarray(inf)[0]):
            return None
        from ..numeric.bigint import limbs_to_int

        xc = limbs_to_int(np.asarray(limb.from_mont(x, BN254_G1.field))[:, 0])
        yc = limbs_to_int(np.asarray(limb.from_mont(y, BN254_G1.field))[:, 0])
        return (xc, yc)


@dataclasses.dataclass
class VerificationKey:
    """ref: plonk/proof_system/verification_key/verification_key.hpp."""

    n: int
    num_public_inputs: int
    commitments: Dict[str, Optional[Tuple[int, int]]]
    domain_root: int
    g2_x: tuple  # Fq2 affine pair
    settings: StandardSettings = STANDARD
    contains_recursive_proof: bool = False
    # 16 public-input slots holding P0/P1 as 4x68-bit limbs each
    # (ref: verifier.cpp:173-208, constants.hpp:8)
    recursive_proof_public_input_indices: Optional[tuple] = None
