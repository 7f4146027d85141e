"""PLONK proof system — TPU-native (ref: plonk/proof_system/)."""

from .composer import StandardComposer, TurboComposer  # noqa: F401
