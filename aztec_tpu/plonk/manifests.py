"""Fiat-Shamir manifests + polynomial manifests for each PLONK flavour.

Byte-for-byte mirrors of the reference's manifest literals
(ref: plonk/composer/standard_composer.hpp:119-160 create_manifest,
plonk/proof_system/types/polynomial_manifest.hpp:94-106
standard_polynomial_manifest).
"""

from __future__ import annotations

import dataclasses

from ..transcript.manifest import Manifest, ManifestEntry as E, RoundManifest as RM

G1_SIZE = 64
FR_SIZE = 32


def standard_manifest(num_public_inputs: int) -> Manifest:
    pub = FR_SIZE * num_public_inputs
    return Manifest(
        rounds=(
            RM(
                elements=(
                    E("circuit_size", 4, True),
                    E("public_input_size", 4, True),
                ),
                challenge="init",
                num_challenges=1,
            ),
            RM(elements=(), challenge="eta", num_challenges=0),
            RM(
                elements=(
                    E("public_inputs", pub, False),
                    E("W_1", G1_SIZE, False),
                    E("W_2", G1_SIZE, False),
                    E("W_3", G1_SIZE, False),
                ),
                challenge="beta",
                num_challenges=2,
            ),
            RM(elements=(E("Z", G1_SIZE, False),), challenge="alpha", num_challenges=1),
            RM(
                elements=(
                    E("T_1", G1_SIZE, False),
                    E("T_2", G1_SIZE, False),
                    E("T_3", G1_SIZE, False),
                ),
                challenge="z",
                num_challenges=1,
            ),
            RM(
                elements=(
                    E("t", FR_SIZE, True, -1),
                    E("w_1", FR_SIZE, False, 0),
                    E("w_2", FR_SIZE, False, 1),
                    E("w_3", FR_SIZE, False, 2),
                    E("sigma_1", FR_SIZE, False, 3),
                    E("sigma_2", FR_SIZE, False, 4),
                    E("r", FR_SIZE, False, 5),
                    E("z_omega", FR_SIZE, False, -1),
                    E("w_3_omega", FR_SIZE, False, 2),
                ),
                challenge="nu",
                num_challenges=7,
                map_challenges=True,
            ),
            RM(
                elements=(
                    E("PI_Z", G1_SIZE, False),
                    E("PI_Z_OMEGA", G1_SIZE, False),
                ),
                challenge="separator",
                num_challenges=1,
            ),
        )
    )


def mimc_manifest(num_public_inputs: int) -> Manifest:
    """ref: mimc_composer.hpp:207-246 create_manifest — standard rounds
    with q_mimc_coefficient opened at nu index 6 and w_3_omega at 0."""
    pub = FR_SIZE * num_public_inputs
    base = standard_manifest(num_public_inputs)
    rounds = list(base.rounds)
    rounds[5] = RM(
        elements=(
            E("t", FR_SIZE, True, -1),
            E("w_1", FR_SIZE, False, 0),
            E("w_2", FR_SIZE, False, 1),
            E("w_3", FR_SIZE, False, 2),
            E("sigma_1", FR_SIZE, False, 3),
            E("sigma_2", FR_SIZE, False, 4),
            E("r", FR_SIZE, False, 5),
            E("q_mimc_coefficient", FR_SIZE, False, 6),
            E("z_omega", FR_SIZE, False, -1),
            E("w_3_omega", FR_SIZE, False, 0),
        ),
        challenge="nu",
        num_challenges=10,
        map_challenges=True,
    )
    return Manifest(rounds=tuple(rounds))


def turbo_manifest(num_public_inputs: int) -> Manifest:
    """ref: plonk/composer/turbo_composer.hpp:104-160."""
    pub = FR_SIZE * num_public_inputs
    return Manifest(
        rounds=(
            RM(
                elements=(
                    E("circuit_size", 4, True),
                    E("public_input_size", 4, True),
                ),
                challenge="init",
                num_challenges=1,
            ),
            RM(elements=(), challenge="eta", num_challenges=0),
            RM(
                elements=(
                    E("public_inputs", pub, False),
                    E("W_1", G1_SIZE, False),
                    E("W_2", G1_SIZE, False),
                    E("W_3", G1_SIZE, False),
                    E("W_4", G1_SIZE, False),
                ),
                challenge="beta",
                num_challenges=2,
            ),
            RM(elements=(E("Z", G1_SIZE, False),), challenge="alpha", num_challenges=1),
            RM(
                elements=(
                    E("T_1", G1_SIZE, False),
                    E("T_2", G1_SIZE, False),
                    E("T_3", G1_SIZE, False),
                    E("T_4", G1_SIZE, False),
                ),
                challenge="z",
                num_challenges=1,
            ),
            RM(
                elements=(
                    E("t", FR_SIZE, True, -1),
                    E("w_1", FR_SIZE, False, 0),
                    E("w_2", FR_SIZE, False, 1),
                    E("w_3", FR_SIZE, False, 2),
                    E("w_4", FR_SIZE, False, 3),
                    E("sigma_1", FR_SIZE, False, 4),
                    E("sigma_2", FR_SIZE, False, 5),
                    E("sigma_3", FR_SIZE, False, 6),
                    E("q_arith", FR_SIZE, False, 7),
                    E("q_ecc_1", FR_SIZE, False, 8),
                    E("q_c", FR_SIZE, False, 9),
                    E("r", FR_SIZE, False, 10),
                    E("z_omega", FR_SIZE, False, -1),
                    E("w_1_omega", FR_SIZE, False, 0),
                    E("w_2_omega", FR_SIZE, False, 1),
                    E("w_3_omega", FR_SIZE, False, 2),
                    E("w_4_omega", FR_SIZE, False, 3),
                ),
                challenge="nu",
                num_challenges=11,
                map_challenges=True,
            ),
            RM(
                elements=(
                    E("PI_Z", G1_SIZE, False),
                    E("PI_Z_OMEGA", G1_SIZE, False),
                ),
                challenge="separator",
                num_challenges=1,
            ),
        )
    )


def standard_unrolled_manifest(num_public_inputs: int) -> Manifest:
    """ref: standard_composer.hpp:160-206 create_unrolled_manifest."""
    base = standard_manifest(num_public_inputs)
    nu = RM(
        elements=(
            E("t", FR_SIZE, True, -1),
            E("w_1", FR_SIZE, False, 0),
            E("w_2", FR_SIZE, False, 1),
            E("w_3", FR_SIZE, False, 2),
            E("sigma_1", FR_SIZE, False, 3),
            E("sigma_2", FR_SIZE, False, 4),
            E("sigma_3", FR_SIZE, False, 5),
            E("q_1", FR_SIZE, False, 6),
            E("q_2", FR_SIZE, False, 7),
            E("q_3", FR_SIZE, False, 8),
            E("q_m", FR_SIZE, False, 9),
            E("q_c", FR_SIZE, False, 10),
            E("z", FR_SIZE, False, 11),
            E("z_omega", FR_SIZE, False, -1),
            E("w_3_omega", FR_SIZE, False, 0),
        ),
        challenge="nu",
        num_challenges=12,
        map_challenges=True,
    )
    rounds = list(base.rounds)
    rounds[5] = nu
    return Manifest(rounds=tuple(rounds))


def turbo_unrolled_manifest(num_public_inputs: int) -> Manifest:
    """ref: turbo_composer.hpp:162-215 create_unrolled_manifest."""
    base = turbo_manifest(num_public_inputs)
    nu = RM(
        elements=(
            E("t", FR_SIZE, True, -1),
            E("w_1", FR_SIZE, False, 0),
            E("w_2", FR_SIZE, False, 1),
            E("w_3", FR_SIZE, False, 2),
            E("w_4", FR_SIZE, False, 3),
            E("sigma_1", FR_SIZE, False, 4),
            E("sigma_2", FR_SIZE, False, 5),
            E("sigma_3", FR_SIZE, False, 6),
            E("sigma_4", FR_SIZE, False, 7),
            E("q_1", FR_SIZE, False, 8),
            E("q_2", FR_SIZE, False, 9),
            E("q_3", FR_SIZE, False, 10),
            E("q_4", FR_SIZE, False, 11),
            E("q_5", FR_SIZE, False, 12),
            E("q_m", FR_SIZE, False, 13),
            E("q_c", FR_SIZE, False, 14),
            E("q_arith", FR_SIZE, False, 15),
            E("q_logic", FR_SIZE, False, 16),
            E("q_range", FR_SIZE, False, 17),
            E("q_ecc_1", FR_SIZE, False, 18),
            E("z", FR_SIZE, False, 19),
            E("z_omega", FR_SIZE, False, 19),
            E("w_1_omega", FR_SIZE, False, 0),
            E("w_2_omega", FR_SIZE, False, 1),
            E("w_3_omega", FR_SIZE, False, 2),
            E("w_4_omega", FR_SIZE, False, 3),
        ),
        challenge="nu",
        num_challenges=20,
        map_challenges=True,
    )
    sep = RM(
        elements=(E("PI_Z", G1_SIZE, False), E("PI_Z_OMEGA", G1_SIZE, False)),
        challenge="separator",
        num_challenges=3,
    )
    rounds = list(base.rounds)
    rounds[5] = nu
    rounds[6] = sep
    return Manifest(rounds=tuple(rounds))


def ultra_manifest(num_public_inputs: int) -> Manifest:
    """UltraPlonk (plookup) Fiat-Shamir manifest.

    The reference snapshot reserves the plookup polynomial slots but ships
    no ultra composer (SURVEY.md §0), so there is no literal to mirror; this
    ordering follows the protocol requirements: wires commit BEFORE eta
    (eta compresses the lookup tuple), the sorted-list halves S_1/S_2 commit
    before beta/gamma (they depend on eta), and both grand products Z /
    Z_LOOKUP commit before alpha.
    """
    pub = FR_SIZE * num_public_inputs
    evals = []
    # one nu sub-challenge per polynomial; shifted evals share the index
    for i, (name, idx) in enumerate(
        [("w_1", 0), ("w_2", 1), ("w_3", 2), ("w_4", 3),
         ("sigma_1", 4), ("sigma_2", 5), ("sigma_3", 6), ("sigma_4", 7),
         ("q_1", 8), ("q_2", 9), ("q_3", 10), ("q_4", 11), ("q_5", 12),
         ("q_m", 13), ("q_c", 14), ("q_arith", 15), ("q_logic", 16),
         ("q_range", 17), ("q_ecc_1", 18),
         ("table_1", 19), ("table_2", 20), ("table_3", 21), ("table_4", 22),
         ("q_lookup", 23), ("q_index", 24),
         ("s_1", 25), ("s_2", 26),
         ("z", 27), ("z_lookup", 28)]
    ):
        evals.append(E(name, FR_SIZE, False, idx))
    shifted = [("z_omega", 27), ("w_1_omega", 0), ("w_2_omega", 1),
               ("w_3_omega", 2), ("w_4_omega", 3),
               ("table_1_omega", 19), ("table_2_omega", 20),
               ("table_3_omega", 21), ("table_4_omega", 22),
               ("s_1_omega", 25), ("z_lookup_omega", 28)]
    for name, idx in shifted:
        evals.append(E(name, FR_SIZE, False, idx))
    return Manifest(
        rounds=(
            RM(
                elements=(
                    E("circuit_size", 4, True),
                    E("public_input_size", 4, True),
                ),
                challenge="init",
                num_challenges=1,
            ),
            RM(
                elements=(
                    E("public_inputs", pub, False),
                    E("W_1", G1_SIZE, False),
                    E("W_2", G1_SIZE, False),
                    E("W_3", G1_SIZE, False),
                    E("W_4", G1_SIZE, False),
                ),
                challenge="eta",
                num_challenges=1,
            ),
            RM(
                elements=(
                    E("S_1", G1_SIZE, False),
                    E("S_2", G1_SIZE, False),
                ),
                challenge="beta",
                num_challenges=2,
            ),
            RM(
                elements=(
                    E("Z", G1_SIZE, False),
                    E("Z_LOOKUP", G1_SIZE, False),
                ),
                challenge="alpha",
                num_challenges=1,
            ),
            RM(
                elements=(
                    E("T_1", G1_SIZE, False),
                    E("T_2", G1_SIZE, False),
                    E("T_3", G1_SIZE, False),
                    E("T_4", G1_SIZE, False),
                ),
                challenge="z",
                num_challenges=1,
            ),
            RM(
                elements=tuple([E("t", FR_SIZE, True, -1)] + evals),
                challenge="nu",
                num_challenges=29,
                map_challenges=True,
            ),
            RM(
                elements=(
                    E("PI_Z", G1_SIZE, False),
                    E("PI_Z_OMEGA", G1_SIZE, False),
                ),
                challenge="separator",
                num_challenges=1,
            ),
        )
    )


def ultra_unrolled_manifest(num_public_inputs: int) -> Manifest:
    """Recursion-friendly UltraPlonk manifest: identical element stream to
    ultra_manifest (ultra is already unlinearised, so every evaluation is
    in the clear), but 3 separator challenges for accumulator chaining in
    the outer circuit — the unrolled-turbo convention
    (ref: turbo_composer.hpp:162-215 create_unrolled_manifest)."""
    base = ultra_manifest(num_public_inputs)
    rounds = list(base.rounds)
    rounds[-1] = RM(
        elements=(E("PI_Z", G1_SIZE, False), E("PI_Z_OMEGA", G1_SIZE, False)),
        challenge="separator",
        num_challenges=3,
    )
    return Manifest(rounds=tuple(rounds))


# ---- polynomial manifest ----------------------------------------------------

WITNESS, SELECTOR, PERMUTATION = "witness", "selector", "permutation"


@dataclasses.dataclass(frozen=True)
class PolyDescriptor:
    commitment_label: str
    polynomial_label: str
    is_linearised: bool
    requires_shifted_evaluation: bool
    source: str


STANDARD_POLYNOMIAL_MANIFEST = (
    PolyDescriptor("W_1", "w_1", False, False, WITNESS),
    PolyDescriptor("W_2", "w_2", False, False, WITNESS),
    PolyDescriptor("W_3", "w_3", False, True, WITNESS),
    PolyDescriptor("Z", "z", True, True, WITNESS),
    PolyDescriptor("Q_1", "q_1", True, False, SELECTOR),
    PolyDescriptor("Q_2", "q_2", True, False, SELECTOR),
    PolyDescriptor("Q_3", "q_3", True, False, SELECTOR),
    PolyDescriptor("Q_M", "q_m", True, False, SELECTOR),
    PolyDescriptor("Q_C", "q_c", True, False, SELECTOR),
    PolyDescriptor("SIGMA_1", "sigma_1", False, False, PERMUTATION),
    PolyDescriptor("SIGMA_2", "sigma_2", False, False, PERMUTATION),
    PolyDescriptor("SIGMA_3", "sigma_3", True, False, PERMUTATION),
)


# ref: polynomial_manifest.hpp:109-124 mimc_polynomial_manifest
MIMC_POLYNOMIAL_MANIFEST = (
    PolyDescriptor("W_1", "w_1", False, False, WITNESS),
    PolyDescriptor("W_2", "w_2", False, False, WITNESS),
    PolyDescriptor("W_3", "w_3", False, True, WITNESS),
    PolyDescriptor("Z", "z", True, True, WITNESS),
    PolyDescriptor("Q_1", "q_1", True, False, SELECTOR),
    PolyDescriptor("Q_2", "q_2", True, False, SELECTOR),
    PolyDescriptor("Q_3", "q_3", True, False, SELECTOR),
    PolyDescriptor("Q_M", "q_m", True, False, SELECTOR),
    PolyDescriptor("Q_C", "q_c", True, False, SELECTOR),
    PolyDescriptor("Q_MIMC_COEFFICIENT", "q_mimc_coefficient", False, False,
                   SELECTOR),
    PolyDescriptor("Q_MIMC_SELECTOR", "q_mimc_selector", True, False,
                   SELECTOR),
    PolyDescriptor("SIGMA_1", "sigma_1", False, False, PERMUTATION),
    PolyDescriptor("SIGMA_2", "sigma_2", False, False, PERMUTATION),
    PolyDescriptor("SIGMA_3", "sigma_3", True, False, PERMUTATION),
)


# ref: polynomial_manifest.hpp:126-148 turbo_polynomial_manifest
TURBO_POLYNOMIAL_MANIFEST = (
    PolyDescriptor("W_1", "w_1", False, True, WITNESS),
    PolyDescriptor("W_2", "w_2", False, True, WITNESS),
    PolyDescriptor("W_3", "w_3", False, True, WITNESS),
    PolyDescriptor("W_4", "w_4", False, True, WITNESS),
    PolyDescriptor("Z", "z", True, True, WITNESS),
    PolyDescriptor("Q_1", "q_1", True, False, SELECTOR),
    PolyDescriptor("Q_2", "q_2", True, False, SELECTOR),
    PolyDescriptor("Q_3", "q_3", True, False, SELECTOR),
    PolyDescriptor("Q_4", "q_4", True, False, SELECTOR),
    PolyDescriptor("Q_5", "q_5", True, False, SELECTOR),
    PolyDescriptor("Q_M", "q_m", True, False, SELECTOR),
    PolyDescriptor("Q_C", "q_c", False, False, SELECTOR),
    PolyDescriptor("Q_ARITHMETIC_SELECTOR", "q_arith", False, False, SELECTOR),
    PolyDescriptor("Q_RANGE_SELECTOR", "q_range", True, False, SELECTOR),
    PolyDescriptor("Q_FIXED_BASE_SELECTOR", "q_ecc_1", False, False, SELECTOR),
    PolyDescriptor("Q_LOGIC_SELECTOR", "q_logic", True, False, SELECTOR),
    PolyDescriptor("SIGMA_1", "sigma_1", False, False, PERMUTATION),
    PolyDescriptor("SIGMA_2", "sigma_2", False, False, PERMUTATION),
    PolyDescriptor("SIGMA_3", "sigma_3", False, False, PERMUTATION),
    PolyDescriptor("SIGMA_4", "sigma_4", True, False, PERMUTATION),
)


# UltraPlonk: the turbo polynomials + the reserved plookup slots
# (ref: polynomial_manifest.hpp:23-46 TABLE_1..4/TABLE_INDEX/TABLE_TYPE/S/
# Z_LOOKUP; proving_key.hpp:38-42 LookupType; lookup_tables.md).  The sorted
# list s is stored as its even/odd interleave halves s_1/s_2 so the plookup
# pair products stay row-local with a single shift (docs/ULTRA_DESIGN.md).
ULTRA_POLYNOMIAL_MANIFEST = TURBO_POLYNOMIAL_MANIFEST + (
    PolyDescriptor("TABLE_1", "table_1", False, True, SELECTOR),
    PolyDescriptor("TABLE_2", "table_2", False, True, SELECTOR),
    PolyDescriptor("TABLE_3", "table_3", False, True, SELECTOR),
    PolyDescriptor("TABLE_4", "table_4", False, True, SELECTOR),
    PolyDescriptor("Q_LOOKUP_SELECTOR", "q_lookup", False, False, SELECTOR),
    PolyDescriptor("Q_LOOKUP_INDEX", "q_index", False, False, SELECTOR),
    PolyDescriptor("S_1", "s_1", False, True, WITNESS),
    PolyDescriptor("S_2", "s_2", False, False, WITNESS),
    PolyDescriptor("Z_LOOKUP", "z_lookup", False, True, WITNESS),
)


@dataclasses.dataclass(frozen=True)
class StandardSettings:
    """ref: plonk/proof_system/types/prover_settings.hpp:14-27."""

    name: str = "standard"
    program_width: int = 3
    num_challenge_bytes: int = 32
    hash_type: str = "keccak256"
    use_linearisation: bool = True
    num_roots_cut_out_of_vanishing_polynomial: int = 4
    polynomial_manifest: tuple = STANDARD_POLYNOMIAL_MANIFEST

    def create_manifest(self, num_public_inputs: int) -> Manifest:
        return standard_manifest(num_public_inputs)


@dataclasses.dataclass(frozen=True)
class TurboSettings(StandardSettings):
    """ref: prover_settings.hpp:42-55."""

    name: str = "turbo"
    program_width: int = 4
    polynomial_manifest: tuple = TURBO_POLYNOMIAL_MANIFEST

    def create_manifest(self, num_public_inputs: int) -> Manifest:
        return turbo_manifest(num_public_inputs)


@dataclasses.dataclass(frozen=True)
class UnrolledStandardSettings(StandardSettings):
    """ref: prover_settings.hpp:28-40 — built for in-circuit recursive
    verification: Pedersen+Blake2s transcript, 16-byte challenges, no
    linearisation."""

    name: str = "unrolled_standard"
    num_challenge_bytes: int = 16
    hash_type: str = "pedersen_blake2s"
    use_linearisation: bool = False

    def create_manifest(self, num_public_inputs: int) -> Manifest:
        return standard_unrolled_manifest(num_public_inputs)


@dataclasses.dataclass(frozen=True)
class UnrolledTurboSettings(TurboSettings):
    """ref: prover_settings.hpp:57-68."""

    name: str = "unrolled_turbo"
    num_challenge_bytes: int = 16
    hash_type: str = "pedersen_blake2s"
    use_linearisation: bool = False

    def create_manifest(self, num_public_inputs: int) -> Manifest:
        return turbo_unrolled_manifest(num_public_inputs)


@dataclasses.dataclass(frozen=True)
class UltraSettings(TurboSettings):
    """UltraPlonk / plookup: turbo gate set + lookup argument.  Unlinearised
    (every polynomial is evaluated in the clear), Keccak transcript for
    on-chain compatibility."""

    name: str = "ultra"
    use_linearisation: bool = False
    polynomial_manifest: tuple = ULTRA_POLYNOMIAL_MANIFEST

    def create_manifest(self, num_public_inputs: int) -> Manifest:
        return ultra_manifest(num_public_inputs)


@dataclasses.dataclass(frozen=True)
class UnrolledUltraSettings(UltraSettings):
    """UltraPlonk for in-circuit recursive verification: the plookup
    argument with the Pedersen+Blake2s transcript and 16-byte challenges
    (BASELINE config 5 'UltraPlonk + recursive aggregation'; ref design:
    prover_settings.hpp:57-68 unrolled settings + polynomial_manifest.hpp:
    23-46 plookup slots)."""

    name: str = "unrolled_ultra"
    num_challenge_bytes: int = 16
    hash_type: str = "pedersen_blake2s"

    def create_manifest(self, num_public_inputs: int) -> Manifest:
        return ultra_unrolled_manifest(num_public_inputs)


@dataclasses.dataclass(frozen=True)
class MimcSettings(StandardSettings):
    """ref: mimc_composer.hpp — standard width-3 scheme + the MiMC x^7
    gate (q_mimc_coefficient / q_mimc_selector)."""

    name: str = "mimc"
    polynomial_manifest: tuple = MIMC_POLYNOMIAL_MANIFEST

    def create_manifest(self, num_public_inputs: int) -> Manifest:
        return mimc_manifest(num_public_inputs)


STANDARD = StandardSettings()
TURBO = TurboSettings()
UNROLLED_STANDARD = UnrolledStandardSettings()
UNROLLED_TURBO = UnrolledTurboSettings()
ULTRA = UltraSettings()
UNROLLED_ULTRA = UnrolledUltraSettings()
MIMC = MimcSettings()
