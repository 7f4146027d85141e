"""Radix-2 FFT / iFFT / coset FFT over Fr, Stockham formulation.

TPU-native re-design of the reference's fft_inner_parallel
(polynomials/polynomial_arithmetic.cpp:140-255).  The reference's flattened
block-mask indexing walks gather-style butterflies; TPU gathers cost ~30 ns
PER INDEX (round-4 measurement), so the transform here is the self-sorting
Stockham recurrence instead: log2(n) stages of static slices + one batched
Montgomery multiply + modular add/sub, everything moving at HBM bandwidth.
No bit-reversal pass exists at all.

Polynomials are Montgomery-form uint32 limb planes of shape (L, n).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ff import FR, limb
from ..ff import pallas_field as pf
from .domain import EvaluationDomain


def _mul(a, b):
    """Montgomery multiply routed to the fused Pallas kernel on TPU
    (~800x the jnp limb path on wide batches; bit-compatible)."""
    if pf.use_pallas():
        return pf.mont_mul(a, b, FR)
    return limb.mont_mul(a, b, FR)


def _butterfly(top, bot, tw):
    """(top + tw*bot, top - tw*bot) — ONE fused kernel on TPU."""
    if pf.use_pallas():
        return pf.butterfly(top, bot, tw, FR)
    tb = limb.mont_mul(bot, tw, FR)
    return limb.add_mod(top, tb, FR), limb.sub_mod(top, tb, FR)


@functools.partial(jax.jit, static_argnames=("n",))
def _fft_core(x, roots, bitrev, n: int):
    """Self-sorting Stockham radix-2: every stage is STATIC slices +
    one Montgomery multiply + modular add/sub — no gathers, no
    bit-reversal.

    Invariant: A_t has shape (L, r_t, L_t) with r_t = n/2^t, L_t = 2^t,
    and A_t[:, b, :] = FFT_{L_t} of the stride-r_t subsequence x[b::r_t].
    Step: the even/odd halves of x[b::r_{t+1}] are rows b and b+r_{t+1},
    so A_{t+1}[:, b, k (+L_t)] = top[:, b, k] +- w_{2L_t}^k bot[:, b, k].
    Twiddles are a static strided slice of the (L, n/2) root table.

    Why not the flat indexed form (the round-1..3 design): each of its
    log2(n) stages issued three n-index gathers, and TPU gathers cost
    ~30 ns per index (r4 measurement) — ~0.4 s per stage at 4n = 2^22.
    Stockham's reshape/concat moves the same bytes at memory bandwidth.
    (``bitrev`` is kept in the signature for interface stability; the
    self-sorting recurrence never uses it.)
    """
    del bitrev
    L = x.shape[0]
    logn = n.bit_length() - 1
    if n == 1:
        return x
    A = x.reshape(L, n, 1)
    for t in range(logn):
        Lt = 1 << t
        r_next = n >> (t + 1)
        top = A[:, :r_next, :]
        bot = A[:, r_next:, :]
        stride = n // (2 * Lt)
        tw = roots[:, ::stride]                      # (L, Lt) static slice
        plus, minus = _butterfly(top, bot, tw[:, None, :])
        A = jnp.concatenate([plus, minus], axis=2)
    return A.reshape(L, n)


def fft(x, domain: EvaluationDomain):
    """Coefficient form -> evaluation form over the domain (Montgomery in/out)."""
    return _fft_core(x, domain.forward_roots, domain.bitrev, domain.size)


def fft_with_bitrev(x, roots, bitrev, n: int, inverse: bool = False):
    return _fft_core(x, roots, bitrev, n)


def ifft(x, domain: EvaluationDomain):
    """Evaluation form -> coefficient form (includes 1/n scale)."""
    y = _fft_core(x, domain.inverse_roots, domain.bitrev, domain.size)
    n_inv = _scalar_mont(domain.domain_inverse)
    return _mul(y, n_inv[:, None])


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
    return fft(_mul(x, gp), domain)


def coset_ifft(x, domain: EvaluationDomain, generator: int | None = None):
    """Inverse of coset_fft: iFFT then scale coefficient i by g^-i."""
    y = ifft(x, domain)
    gp = domain.coset_inverse_powers(generator)
    return _mul(y, gp)
