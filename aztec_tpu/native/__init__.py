"""Native (C++) host runtime components.

The reference's host runtime is C++ throughout (composer gate recording,
copy-cycle bookkeeping, witness assembly — plonk/composer/composer_base.cpp).
This package holds the TPU framework's native equivalents, compiled on first
use with g++ and bound through ctypes (no pybind11 in this image).
"""

from .build import load_composer_core  # noqa: F401
