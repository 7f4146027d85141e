from .spec import FieldSpec
from .bn254 import FQ, FR, FQ_MOD, FR_MOD
from . import limb
from . import golden
