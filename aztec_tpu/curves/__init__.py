from .spec import CurveSpec, BN254_G1, GRUMPKIN_G1
from . import golden
from . import group
