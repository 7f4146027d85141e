"""In-circuit standard library (ref: stdlib/).

Witness wrapper types that generate gates on a composer: ``FieldT`` (lazy
mul/add constant composition, stdlib/primitives/field/field.cpp),
``BoolT`` (stdlib/primitives/bool/bool.cpp), ``witness``/``constant``
helpers.  Later phases add uint<N>, byte_array, bigfield/biggroup, and the
recursive verifier.
"""

from .field_t import FieldT, BoolT, witness, constant, public_witness  # noqa: F401
