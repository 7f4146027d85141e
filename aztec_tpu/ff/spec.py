"""Static per-field parameters for the limb-plane kernels.

TPU-native re-design of the reference's ``field<Params>`` template
(ecc/fields/field.hpp): instead of 4x64-bit Montgomery limbs with x64
MULX/ADOX assembly, a field is described by derived uint32 constants consumed
by vectorized 16-bit-limb kernels (see aztec_tpu/ff/limb.py).  Everything here
is computed from the modulus at import time; nothing is hard-coded beyond the
modulus itself and optional generator facts.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..numeric.bigint import int_to_limbs, NLIMBS, LIMB_BITS


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """All static data the device kernels need for one prime field."""

    name: str
    modulus: int
    nlimbs: int = NLIMBS

    # ---- derived (filled in __post_init__ via object.__setattr__) ----
    # Montgomery R = 2**(16*nlimbs) mod p; constants as (L,) uint32 numpy.

    def __post_init__(self):
        p = self.modulus
        L = self.nlimbs
        R = 1 << (LIMB_BITS * L)
        if not (p % 2 == 1 and p < R // 4):
            # p < R/4 guarantees a*b < p^2 < R*p and lazy bounds hold
            raise ValueError("modulus out of supported range")
        set_ = lambda k, v: object.__setattr__(self, k, v)
        set_("R", R % p)
        set_("R2", (R * R) % p)
        set_("R3", (R * R * R) % p)
        set_("pprime", (-pow(p, -1, R)) % R)  # -p^-1 mod R
        set_("p_limbs", int_to_limbs(p, L))
        set_("pprime_limbs", int_to_limbs(self.pprime, L))
        set_("r2_limbs", int_to_limbs(self.R2, L))
        set_("one_mont_limbs", int_to_limbs(self.R, L))
        set_("comp_p_limbs", int_to_limbs((1 << (LIMB_BITS * L)) - p, L))
        set_("zero_limbs", np.zeros((L,), np.uint32))
        # exponent bits for Fermat inversion, LSB first
        e = p - 2
        set_(
            "inv_exp_bits",
            np.array([(e >> i) & 1 for i in range(LIMB_BITS * L)], np.uint32),
        )

    # -- host-side helpers -------------------------------------------------
    def to_mont_int(self, v: int) -> int:
        return (v * self.R) % self.modulus

    def from_mont_int(self, v: int) -> int:
        Rinv = pow(self.R, -1, self.modulus)
        return (v * Rinv) % self.modulus

    @functools.cached_property
    def mont_rinv(self) -> int:
        return pow(self.R, -1, self.modulus)
