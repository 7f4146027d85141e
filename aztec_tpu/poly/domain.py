"""Multiplicative FFT domains over BN254 Fr.

TPU-native analog of the reference's evaluation_domain
(polynomials/evaluation_domain.hpp): instead of per-thread round root tables,
one device-resident half-size root table per domain; each butterfly stage
slices it with a static stride.  Roots are built on device with log-doubling
(mont_mul), not host loops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ff import FR, limb
from ..ff.bn254 import (
    FR_MOD,
    FR_PRIMITIVE_ROOT,
    FR_TWO_ADICITY,
    FR_MULTIPLICATIVE_GENERATOR,
)
from ..numeric.bigint import int_to_limbs


@functools.partial(jax.jit, static_argnames=("count", "spec"))
def powers_table(base_limbs, count: int, spec):
    """[1, b, b^2, ..., b^(count-1)] in Montgomery form, shape (L, count).

    Binary-exponentiation over the index bits as a fori_loop with static
    shapes: acc_i *= (bit k of i set ? b^(2^k) : 1), squaring b each step.
    One compiled stage body regardless of count.
    """
    from jax import lax

    nbits = max((count - 1).bit_length(), 1)
    idx = jnp.arange(count, dtype=jnp.uint32)
    one = jnp.broadcast_to(
        jnp.asarray(spec.one_mont_limbs, jnp.uint32)[:, None],
        (spec.nlimbs, count),
    )

    def step(k, carry):
        acc, bp = carry
        bit = ((idx >> k) & 1) != 0
        factor = jnp.where(bit[None], bp, one)  # bp (L,1) broadcasts
        acc = limb.mont_mul(acc, factor, spec)
        bp = limb.mont_sqr(bp, spec)
        return (acc, bp)

    acc, _ = lax.fori_loop(0, nbits, step, (one, base_limbs[:, None]))
    return acc


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    out = np.zeros_like(idx)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out.astype(np.int32)


class EvaluationDomain:
    """FFT domain of size n (power of two) over Fr.

    Exposes integer facts (root, root_inverse, domain_inverse, generator) and
    lazily-built device tables (forward/inverse root tables in Montgomery
    form, bit-reverse index vector).
    """

    _cache: dict = {}

    def __new__(cls, n: int):
        if n in cls._cache:
            return cls._cache[n]
        self = super().__new__(cls)
        cls._cache[n] = self
        return self

    def __init__(self, n: int):
        if getattr(self, "size", None) == n:
            return
        assert n >= 2 and (n & (n - 1)) == 0, "domain size must be a power of 2"
        log2n = n.bit_length() - 1
        assert log2n <= FR_TWO_ADICITY
        self.size = n
        self.log2_size = log2n
        self.root = pow(FR_PRIMITIVE_ROOT, 1 << (FR_TWO_ADICITY - log2n), FR_MOD)
        self.root_inverse = pow(self.root, -1, FR_MOD)
        self.domain_inverse = pow(n, -1, FR_MOD)
        self.generator = FR_MULTIPLICATIVE_GENERATOR
        self.generator_inverse = pow(FR_MULTIPLICATIVE_GENERATOR, -1, FR_MOD)
        self._tables = {}

    def _table(self, key: str, base_int: int, count: int):
        t = self._tables.get(key)
        if t is None:
            base = jnp.asarray(int_to_limbs((base_int * FR.R) % FR_MOD))
            t = powers_table(base, count, FR)
            # never cache a value produced under an outer trace: the
            # tracer would leak into later calls (UnexpectedTracerError)
            if not isinstance(t, jax.core.Tracer):
                self._tables[key] = t
        return t

    @property
    def forward_roots(self):
        """(L, n/2) Montgomery powers of the domain root."""
        return self._table("fwd", self.root, max(self.size // 2, 1))

    @property
    def inverse_roots(self):
        return self._table("inv", self.root_inverse, max(self.size // 2, 1))

    @property
    def bitrev(self):
        t = self._tables.get("bitrev")
        if t is None:
            t = jnp.asarray(_bit_reverse_indices(self.size))
            if not isinstance(t, jax.core.Tracer):
                self._tables["bitrev"] = t
        return t

    def coset_powers(self, g_int: int | None = None, count: int | None = None):
        """Powers of the coset generator (default: multiplicative generator)."""
        g = self.generator if g_int is None else g_int
        count = self.size if count is None else count
        return self._table(f"coset_{g}_{count}", g, count)

    def coset_inverse_powers(self, g_int: int | None = None, count: int | None = None):
        g = self.generator if g_int is None else g_int
        gi = pow(g, -1, FR_MOD)
        count = self.size if count is None else count
        return self._table(f"cosetinv_{g}_{count}", gi, count)
