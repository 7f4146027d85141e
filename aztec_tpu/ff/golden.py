"""Pure-Python reference ("golden") field arithmetic for tests.

Mirrors the semantics of the device kernels in aztec_tpu/ff/limb.py using
Python big ints.  This plays the role of the reference's generic C++ field
implementation (ecc/fields/field_impl_generic.hpp) as the slow-but-obviously-
correct oracle for the TPU kernels.
"""

from __future__ import annotations

from .spec import FieldSpec


def add(spec: FieldSpec, a: int, b: int) -> int:
    return (a + b) % spec.modulus


def sub(spec: FieldSpec, a: int, b: int) -> int:
    return (a - b) % spec.modulus


def neg(spec: FieldSpec, a: int) -> int:
    return (-a) % spec.modulus


def mont_mul(spec: FieldSpec, a: int, b: int) -> int:
    """REDC(a*b): inputs/outputs in Montgomery form."""
    p = spec.modulus
    R = 1 << (16 * spec.nlimbs)
    T = a * b
    m = ((T % R) * spec.pprime) % R
    u = (T + m * p) // R
    return u - p if u >= p else u


def to_mont(spec: FieldSpec, a: int) -> int:
    return (a * spec.R) % spec.modulus


def from_mont(spec: FieldSpec, a: int) -> int:
    return (a * spec.mont_rinv) % spec.modulus


def inv(spec: FieldSpec, a: int) -> int:
    """Inverse in Montgomery form: a_mont -> (a^-1)_mont; 0 -> 0."""
    if a == 0:
        return 0
    v = from_mont(spec, a)
    return to_mont(spec, pow(v, -1, spec.modulus))


def pow_(spec: FieldSpec, a: int, e: int) -> int:
    """Power in Montgomery form."""
    return to_mont(spec, pow(from_mont(spec, a), e, spec.modulus))
