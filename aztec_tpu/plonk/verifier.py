"""PLONK verifier — host big-int code (O(1) per proof), flavor-generic.

Mirrors the reference VerifierBase<program_settings>::verify_proof
(plonk/proof_system/verifier/verifier.cpp:40-223): transcript replay, quotient
evaluation reconstruction (per-flavor widget evaluation kernels), Kate
batch-verify scalar accumulation (manifest-driven,
kate_commitment_scheme.cpp:238-371), a ~20-point MSM, and the final pairing
check.  Verification work is constant-size, so it runs on the host in pure
Python ints; only proving is TPU-scale.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from ..ff.bn254 import FR_MOD
from ..curves import pairing as pr
from ..poly.arithmetic import get_lagrange_evaluations, compute_public_input_delta
from ..transcript.transcript import Transcript
from .proving_key import VerificationKey
from .serialize import fr_to_bytes, g1_from_bytes, u32_to_bytes

M = FR_MOD


class Verifier:
    def __init__(self, key: VerificationKey, flavor):
        self.key = key
        self.flavor = flavor
        self.settings = flavor.settings

    def verify_proof(self, proof: bytes) -> bool:
        """Reject (never raise) on malformed untrusted proof bytes: length
        mismatches, non-canonical/off-curve points, zeta on a domain root,
        missing transcript elements (ADVICE r1: a hostile proof must not
        crash a verifying service)."""
        try:
            return self._verify_proof_checked(proof)
        except (AssertionError, ValueError, KeyError, IndexError):
            return False

    def pairing_inputs(self, proof: bytes):
        """The two pairing inputs (P0, P1) BEFORE recursive-accumulator
        folding and the pairing check — the values an in-circuit verifier
        must reproduce (ref: verifier.hpp recursion_output{P0,P1}).
        Returns None on malformed proofs."""
        try:
            acc = self._accumulate(proof)
        except (AssertionError, ValueError, KeyError, IndexError):
            return None
        if acc is False:
            return None
        return acc[0], acc[1]

    def _verify_proof_checked(self, proof: bytes) -> bool:
        acc = self._accumulate(proof)
        if acc is False:
            return False
        P0, P1, public_inputs, separator = acc
        key = self.key
        if key.contains_recursive_proof:
            # fold the inner proof's deferred pairing accumulators, recovered
            # from 16 public-input limbs of 68 bits (ref: verifier.cpp:173-208)
            idx = key.recursive_proof_public_input_indices
            assert idx is not None and len(idx) == 16

            def recover(i0):
                limb_vals = [public_inputs[idx[i0 + k]] for k in range(4)]
                return sum(v << (68 * k) for k, v in enumerate(limb_vals))

            u2 = separator * separator % M
            inner_p0 = (recover(0), recover(4))
            inner_p1 = (recover(8), recover(12))
            if not (pr.g1_on_curve(inner_p0) and pr.g1_on_curve(inner_p1)):
                return False
            P0 = pr.g1_add(P0, pr.g1_mul(u2, inner_p0))
            P1 = pr.g1_add(P1, pr.g1_mul(u2, inner_p1))
        # e(P0, [1]_2) * e(P1, [x]_2) == 1
        # (ref: verifier.cpp:219 + mem_reference_string.cpp:20-21 line order)
        from ..curves.tower import G2_GEN

        return pr.pairing_check([(P0, G2_GEN), (P1, self.key.g2_x)])

    def _accumulate(self, proof: bytes):
        key = self.key
        s = self.settings
        width = self.flavor.width
        manifest = s.create_manifest(key.num_public_inputs)
        t = Transcript.from_proof(manifest, proof, hasher=s.hash_type,
                                  num_challenge_bytes=s.num_challenge_bytes)
        t.add_element("circuit_size", u32_to_bytes(key.n))
        t.add_element("public_input_size", u32_to_bytes(key.num_public_inputs))
        for name in ("init", "eta", "beta", "alpha", "z"):
            t.apply_fiat_shamir(name)

        ch = {
            "alpha": t.get_challenge_fr("alpha"),
            "beta": t.get_challenge_fr("beta", 0),
            "gamma": t.get_challenge_fr("beta", 1),
            "zeta": t.get_challenge_fr("z"),
        }
        if getattr(self.flavor, "uses_lookups", False):
            ch["eta"] = t.get_challenge_fr("eta")
        zeta = ch["zeta"]
        n = key.n
        root = key.domain_root

        vanishing, l_start, l_end = get_lagrange_evaluations(
            zeta, n, root, s.num_roots_cut_out_of_vanishing_polynomial
        )

        # collect evaluations from the transcript (manifest-driven)
        ev: Dict[str, int] = {}
        for info in s.polynomial_manifest:
            if not info.is_linearised or not s.use_linearisation:
                ev[info.polynomial_label] = t.get_element_fr(info.polynomial_label)
            if info.requires_shifted_evaluation:
                ev[info.polynomial_label + "_omega"] = t.get_element_fr(
                    info.polynomial_label + "_omega"
                )
        if s.use_linearisation:
            ev["r"] = t.get_element_fr("r")

        pub_bytes = t.get_element("public_inputs")
        public_inputs = [
            int.from_bytes(pub_bytes[i * 32 : (i + 1) * 32], "big") % M
            for i in range(len(pub_bytes) // 32)
        ]
        delta = compute_public_input_delta(
            public_inputs, ch["beta"], ch["gamma"], root
        )

        t_eval = self.flavor.verifier_t_contribution(ev, ch, l_start, l_end, delta)
        t_eval = t_eval * pow(vanishing, -1, M) % M
        t.add_element("t", fr_to_bytes(t_eval))

        t.apply_fiat_shamir("nu")
        t.apply_fiat_shamir("separator")
        separator = t.get_challenge_fr("separator")
        nu = lambda label: t.get_challenge_fr_from_map("nu", label)

        # -- Kate batch verification scalars (manifest-driven)
        #    (ref: kate_commitment_scheme.cpp:238-371) -------------------------
        g1_elements: Dict[str, Optional[Tuple[int, int]]] = {}
        fr_scalars: Dict[str, int] = {}
        batch_eval = 0

        for item in s.polynomial_manifest:
            label = item.commitment_label
            plabel = item.polynomial_label
            if item.source == "witness":
                el = g1_from_bytes(t.get_element(label))
                if el is None or not pr.g1_on_curve(el):
                    return False
                g1_elements[label] = el
            else:
                el = key.commitments[label]
                if el is not None and not pr.g1_on_curve(el):
                    return False
                g1_elements[label] = el

            scalar = 0
            if item.requires_shifted_evaluation:
                challenge = nu(plabel + "_omega")
                scalar = (scalar + separator * challenge) % M
                batch_eval = (
                    batch_eval
                    + separator * challenge % M * ev[plabel + "_omega"]
                ) % M
            if not item.is_linearised or not s.use_linearisation:
                challenge = nu(plabel)
                scalar = (scalar + challenge) % M
                batch_eval = (batch_eval + challenge * ev[plabel]) % M
            fr_scalars[label] = scalar

        z_pow_n = pow(zeta, n, M)
        quotient_challenge = nu("t")
        z_power = 1
        for i in range(width):
            label = f"T_{i+1}"
            el = g1_from_bytes(t.get_element(label))
            if el is None or not pr.g1_on_curve(el):
                # reject malformed quotient commitments outright instead of
                # silently treating them as the identity (ADVICE r1)
                return False
            g1_elements[label] = el
            fr_scalars[label] = quotient_challenge * z_power % M
            z_power = z_power * z_pow_n % M

        if s.use_linearisation:
            batch_eval = (batch_eval + nu("r") * ev["r"]) % M
        batch_eval = (batch_eval + t_eval * quotient_challenge) % M
        g1_elements["BATCH_EVALUATION"] = (1, 2)  # the generator
        fr_scalars["BATCH_EVALUATION"] = (-batch_eval) % M

        # -- [D]_1 scalars: permutation + transition widgets (linearised only,
        #    ref: transition_widget.hpp:372-380) -------------------------------
        if s.use_linearisation:
            linear_nu = nu("r")
            z_mult, sigma_mult = self.flavor.perm_linear_terms(ev, ch, l_start)
            fr_scalars["Z"] = (fr_scalars.get("Z", 0) + z_mult * linear_nu) % M
            fr_scalars[f"SIGMA_{width}"] = (
                fr_scalars.get(f"SIGMA_{width}", 0) + sigma_mult * linear_nu
            ) % M
            label_map = {
                "q_m": "Q_M", "q_1": "Q_1", "q_2": "Q_2", "q_3": "Q_3",
                "q_4": "Q_4", "q_5": "Q_5", "q_c": "Q_C",
                "q_arith": "Q_ARITHMETIC_SELECTOR",
                "q_range": "Q_RANGE_SELECTOR",
                "q_ecc_1": "Q_FIXED_BASE_SELECTOR",
                "q_logic": "Q_LOGIC_SELECTOR",
                "q_mimc_selector": "Q_MIMC_SELECTOR",
            }
            for plabel, scalar in self.flavor.selector_linear_scalars(
                ev, ch
            ).items():
                label = label_map[plabel]
                fr_scalars[label] = (
                    fr_scalars.get(label, 0) + scalar * linear_nu
                ) % M

        # -- opening commitments --------------------------------------------------
        PI_Z = g1_from_bytes(t.get_element("PI_Z"))
        PI_Z_OMEGA = g1_from_bytes(t.get_element("PI_Z_OMEGA"))
        if PI_Z is None or not pr.g1_on_curve(PI_Z):
            return False
        if PI_Z_OMEGA is None or not pr.g1_on_curve(PI_Z_OMEGA):
            return False
        g1_elements["PI_Z"] = PI_Z
        fr_scalars["PI_Z"] = zeta
        g1_elements["PI_Z_OMEGA"] = PI_Z_OMEGA
        fr_scalars["PI_Z_OMEGA"] = zeta * root % M * separator % M

        pairs = [
            (fr_scalars[k], v)
            for k, v in g1_elements.items()
            if v is not None and pr.g1_on_curve(v)
        ]
        P0 = pr.g1_msm(pairs)
        P1 = pr.g1_neg(pr.g1_add(pr.g1_mul(separator, PI_Z_OMEGA), PI_Z))
        return P0, P1, public_inputs, separator
