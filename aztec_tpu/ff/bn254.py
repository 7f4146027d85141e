"""BN254 base/scalar field parameters.

Moduli are the public alt_bn128 constants; cross-checked against the limb
constants in the reference (ecc/curves/bn254/fq.hpp:11-14, fr.hpp:12-15).

Generator/root facts used for FFT domains and coset encodings (values verified
against reference fr.hpp:28-31 primitive_root and fr.hpp:44-60
coset_generators in tests/test_ff.py):
- Fr has 2-adicity 28; the reference's canonical 2^28-th primitive root is
  ``FR_PRIMITIVE_ROOT`` below (equal to 5**((r-1)/2**28) mod r with the
  multiplicative generator 5).
- "Coset generator" k for sigma-permutation column encoding is the small
  integer series used by the reference (external coset generators 5,6,7,...
  skipping values whose ratios hit subgroup elements; here recorded as facts
  and verified numerically against fr.hpp constants).
"""

from .spec import FieldSpec

FQ_MOD = 0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47
FR_MOD = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001

FQ = FieldSpec("bn254_fq", FQ_MOD)
FR = FieldSpec("bn254_fr", FR_MOD)

# multiplicative generator of Fr* (smallest; the reference's coset FFTs use
# it too) and the derived maximal 2-adic root of unity.  Verified numerically:
# the reference's primitive_root constant (fr.hpp:28-31, Montgomery form)
# equals 5**((r-1)/2**28) mod r in canonical form.
FR_MULTIPLICATIVE_GENERATOR = 5
FR_TWO_ADICITY = 28
FR_PRIMITIVE_ROOT = pow(
    FR_MULTIPLICATIVE_GENERATOR, (FR_MOD - 1) >> FR_TWO_ADICITY, FR_MOD
)

# Coset generators for sigma-permutation column encoding: canonical values of
# the reference's fr coset_generators table (fr.hpp:44-60) are exactly
# 5, 6, ..., 12 (verified numerically against the Montgomery constants).
FR_COSET_GENERATORS = tuple(range(5, 13))

# Cube roots of unity for the GLV endomorphism (beta in Fq scales x;
# lambda in Fr scales scalars).  Canonical forms of the reference constants
# (verified numerically): fr cube_root (fr.hpp:22-25) = 3**((r-1)/3) mod r and
# fq cube_root (fq.hpp:22-25) = (3**((q-1)/3))**2 mod q.
FR_LAMBDA = pow(3, (FR_MOD - 1) // 3, FR_MOD)
FQ_BETA = pow(pow(3, (FQ_MOD - 1) // 3, FQ_MOD), 2, FQ_MOD)
