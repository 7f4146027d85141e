"""Coset FFT sharded over a device mesh with one all-to-all.

Generalizes the reference's WASM trick — splitting one 4n coset FFT into 4
independent shifted n-FFTs (work_queue.hpp:166-200, 246-258;
polynomial_arithmetic.cpp:401 coset_fft with domain_extension) — to D
devices via the decimation-in-time identity

    X(x) = sum_j x^j c_j(x^D),   c_j(y) = sum_i coeff[D i + j] y^i

Stage 1 (local):   E_j = coset-FFT_m(c_j, generator g^D), m = N/D
Stage 2 (ICI):     all-to-all redistributing E's m points into D blocks
Stage 3 (local):   X[t + m v] = sum_j g^j W^{tj} zeta_D^{vj} E_j[t]

Layouts: input coefficients (L, D, m) with [:, j, i] = coeff[D i + j],
sharded over axis 1; output (L, D, m) with [:, v, t] = X(g W^{t + m v}),
sharded over the t axis in blocks of m/D.  Requires D^2 | N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import warnings

with warnings.catch_warnings():
    # jax.shard_map (0.8+) renamed check_rep->check_vma; keep the stable
    # experimental API until we migrate the flag
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from ..ff import FR, limb
from ..ff.bn254 import FR_MOD
from ..poly.domain import EvaluationDomain, powers_table
from ..poly import fft_ops as pfft
from ..poly.arithmetic import fr_mont_plane


def interleave(coeffs: jnp.ndarray, D: int) -> jnp.ndarray:
    """(L, N) monomial coeffs -> (L, D, N/D) residue-major layout."""
    L, N = coeffs.shape
    return jnp.transpose(coeffs.reshape(L, N // D, D), (0, 2, 1))


def deinterleave_output(out: jnp.ndarray) -> jnp.ndarray:
    """(L, D, m) output with [:, v, t] = X[t + m v] -> natural (L, N)."""
    L, D, m = out.shape
    return out.reshape(L, D * m)


def sharded_coset_fft(mesh: Mesh, axis: str, coeffs: jnp.ndarray,
                      domain: EvaluationDomain):
    """coeffs: (L, N) Montgomery monomial coefficients (replicated or host).

    Returns (L, N) evaluations X(g W^q) ordered [v-major][t] as described
    above; use ``natural_order_indices`` to map to natural q order.
    """
    D = mesh.shape[axis]
    N = domain.size
    assert N % (D * D) == 0, "need D^2 | N"
    m = N // D
    g = domain.generator
    W = domain.root

    sub = EvaluationDomain(m)
    # roots/bitrev tables for the local sub-FFTs (replicated closures)
    sub_roots = sub.forward_roots
    sub_bitrev = sub.bitrev
    gD = pow(g, D, FR_MOD)
    gD_pows = powers_table(fr_mont_plane(gD), m, FR)

    # stage-3 twiddles: for local block k, factor[j, v, s] =
    # g^j * W^{(k m/D + s) j} * zeta_D^{v j};  zeta_D = W^m
    blk = m // D

    x = interleave(coeffs, D)

    def local_fft(xj):
        # xj: (L, 1, m) this device's residue-j coefficients
        cj = xj[:, 0, :]
        scaled = limb.mont_mul(cj, gD_pows, FR)
        E = pfft.fft_with_bitrev(scaled, sub_roots, sub_bitrev, m)
        # split into D blocks of size m/D for the all-to-all
        E = E.reshape(FR.nlimbs, 1, D, blk)
        E = jax.lax.all_to_all(E, axis, split_axis=2, concat_axis=1,
                               tiled=False)
        # E now: (L, D, 1, blk) -> (L, D, blk): E[:, j, s] = E_j[k*blk + s]
        E = E[:, :, 0, :]

        k = jax.lax.axis_index(axis)
        j_idx = jnp.arange(D, dtype=jnp.uint32)

        # per-j twiddle bases as powers tables (device-resident, tiny)
        # factor[j, s] = g^j * W^{(k*blk+s) j}
        # build with mont_pow over integer exponents via powers tables:
        # W^{(k*blk+s) j} = (W^j)^{k*blk+s}
        out = None
        zeta = pow(W, m, FR_MOD)
        acc = []
        for j in range(D):
            Wj = fr_mont_plane(pow(W, j, FR_MOD))
            # (W^j)^{k*blk + s} = (W^j)^{k*blk} * (W^j)^s
            Wj_pows = powers_table(Wj, blk, FR)  # (L, blk)
            base = limb.mont_pow(
                jnp.broadcast_to(Wj[:, None], (FR.nlimbs, 1)),
                _index_bits(k, blk, N),
                FR,
            )
            gj = fr_mont_plane(pow(g, j, FR_MOD))[:, None]
            fac = limb.mont_mul(limb.mont_mul(Wj_pows, base, FR), gj, FR)
            term = limb.mont_mul(E[:, j, :], fac, FR)  # (L, blk)
            # v axis: multiply by zeta_D^{v j}
            zv = jnp.stack(
                [fr_mont_plane(pow(zeta, (v * j) % N, FR_MOD)) for v in range(D)],
                axis=1,
            )  # (L, D)
            contrib = limb.mont_mul(term[:, None, :], zv[:, :, None], FR)
            acc.append(contrib)
        out = acc[0]
        for a in acc[1:]:
            out = limb.add_mod(out, a, FR)
        return out  # (L, D, blk): [:, v, s] = X[(k*blk + s) + m v]

    fn = shard_map(
        local_fft,
        mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, None, axis),
        check_rep=False,
    )
    out = fn(x)  # (L, D, m) sharded over last axis
    return deinterleave_output(out)


def _index_bits(k, blk: int, N: int):
    """uint32 bit array (LSB-first) of the traced integer k*blk, length
    log2(N) bits — consumed by mont_pow for (W^j)^{k*blk}."""
    nbits = max(N.bit_length(), 2)
    e = k * blk
    return (e >> jnp.arange(nbits, dtype=jnp.uint32)) & 1


def natural_order(out: jnp.ndarray, D: int) -> jnp.ndarray:
    """Reorder (L, N) [v-major][t] output to natural q = t + m v order...
    the layout already IS q = v*m + t when reshaped (v, t) -> q ✓."""
    return out
