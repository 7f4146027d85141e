"""Radix-2 FFT / iFFT / coset FFT over Fr as batched butterfly stages.

TPU-native re-design of the reference's fft_inner_parallel
(polynomials/polynomial_arithmetic.cpp:140-255).  The reference's flattened
block-mask indexing is already the vectorized formulation; here the whole
transform is ONE ``lax.fori_loop`` over log2(n) stages whose body is a
full-width gather + batched Montgomery multiply + add/sub select:

    for element i at stage with half-block m:   j = i & (m-1)
        a = x[i & ~m],  b = x[i | m],  t = root^(j * n/(2m)) * b
        x[i] = (i & m) ? a - t : a + t

Every stage touches all n lanes with static shapes, so XLA compiles a single
stage body (compile time O(1) in n) at the cost of computing each butterfly
product twice — the right trade on a vector machine.  Bit-reversal is a
single gather before the loop.

Polynomials are Montgomery-form uint32 limb planes of shape (L, n).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ff import FR, limb
from .domain import EvaluationDomain


@functools.partial(jax.jit, static_argnames=("n",))
def _fft_core(x, roots, bitrev, n: int):
    L = x.shape[0]
    logn = n.bit_length() - 1
    x = jnp.take(x, bitrev, axis=1)
    idx = jnp.arange(n, dtype=jnp.int32)

    def stage(s, x):
        m = jnp.int32(1) << s
        half_stride = jnp.int32(n) >> (s + 1)
        j = idx & (m - 1)
        w = jnp.take(roots, j * half_stride, axis=1)  # (L, n)
        xa = jnp.take(x, idx & ~m, axis=1)
        xb = jnp.take(x, idx | m, axis=1)
        t = limb.mont_mul(xb, w, FR)
        apt = limb.add_mod(xa, t, FR)
        amt = limb.sub_mod(xa, t, FR)
        hi = (idx & m) != 0
        return jnp.where(hi[None], amt, apt)

    return lax.fori_loop(0, logn, stage, x)


def fft(x, domain: EvaluationDomain):
    """Coefficient form -> evaluation form over the domain (Montgomery in/out)."""
    return _fft_core(x, domain.forward_roots, domain.bitrev, domain.size)


def fft_with_bitrev(x, roots, bitrev, n: int, inverse: bool = False):
    return _fft_core(x, roots, bitrev, n)


def ifft(x, domain: EvaluationDomain):
    """Evaluation form -> coefficient form (includes 1/n scale)."""
    y = _fft_core(x, domain.inverse_roots, domain.bitrev, domain.size)
    n_inv = _scalar_mont(domain.domain_inverse)
    return limb.mont_mul(y, n_inv[:, None], FR)


@functools.lru_cache(maxsize=None)
def _scalar_mont(v: int):
    from ..numeric.bigint import int_to_limbs
    from ..ff.bn254 import FR_MOD

    return jnp.asarray(int_to_limbs((v * FR.R) % FR_MOD))


def coset_fft(x, domain: EvaluationDomain, generator: int | None = None):
    """FFT of p(g*X): scale coefficient i by g^i, then FFT.

    Matches the reference's coset_fft_inner (polynomial_arithmetic.cpp:395).
    """
    gp = domain.coset_powers(generator)
    return fft(limb.mont_mul(x, gp, FR), domain)


def coset_ifft(x, domain: EvaluationDomain, generator: int | None = None):
    """Inverse of coset_fft: iFFT then scale coefficient i by g^-i."""
    y = ifft(x, domain)
    gp = domain.coset_inverse_powers(generator)
    return limb.mont_mul(y, gp, FR)
