"""Curve parameter bundles (short Weierstrass, a = 0).

TPU-native analog of the reference's group<coordinate_field, subgroup_field,
GroupParams> template (ecc/groups/group.hpp): a curve is its base/scalar
FieldSpecs plus the b constant and a generator.

Generator facts (verified in tests):
- bn254 g1: y^2 = x^3 + 3, generator (1, 2)  (ref: ecc/curves/bn254/g1.hpp —
  one_y Montgomery constant equals 2).
- grumpkin: y^2 = x^3 - 17 over Fr (the cycle curve: base/scalar fields
  swapped vs bn254), generator (1, sqrt(-16))  (ref:
  ecc/curves/grumpkin/grumpkin.hpp:11-29; canonical y value below verified
  against the reference's Montgomery constant and y^2 = -16).
"""

from __future__ import annotations

import dataclasses

from ..ff.spec import FieldSpec
from ..ff.bn254 import FQ, FR, FQ_MOD, FR_MOD


@dataclasses.dataclass(frozen=True)
class CurveSpec:
    name: str
    field: FieldSpec          # coordinate field
    scalar_field: FieldSpec   # subgroup order field
    b: int                    # curve constant (canonical form)
    gen_x: int
    gen_y: int

    @property
    def order(self) -> int:
        return self.scalar_field.modulus


GRUMPKIN_GEN_Y = 0x2CF135E7506A45D632D270D45F1181294833FC48D823F272C


BN254_G1 = CurveSpec(
    name="bn254_g1",
    field=FQ,
    scalar_field=FR,
    b=3,
    gen_x=1,
    gen_y=2,
)

GRUMPKIN_G1 = CurveSpec(
    name="grumpkin_g1",
    field=FR,
    scalar_field=FQ,
    b=(-17) % FR_MOD,
    gen_x=1,
    gen_y=GRUMPKIN_GEN_Y,
)
