"""XLA:CPU test-environment mitigations, quarantined out of product code.

XLA:CPU in this jaxlib sporadically SIGSEGVs when materializing a NEW
executable (fresh compile or AOT cache load) late in a process that has
already built ~20 executables; the identical executable materializes fine
while the process is young (see STATUS.md).  The prover's round 5/6
kernels (evaluation stacks, linearisation/opening combinations, Kate
division) introduce fresh shape keys at exactly that late point, so
``prewarm_prover`` touches every one of them with zero-valued dummies
before proving starts.  No-op on TPU (and disableable with
AZTEC_NO_PREWARM=1).

This is a test-infrastructure workaround, not part of the proving
protocol — keep prover.py free of it (VERDICT r1 Weak #8).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp

from ..ff import FR, limb
from ..poly import fft_ops as pfft
from ..poly.arithmetic import kate_divide
from ..poly.domain import powers_table
from ..plonk import kernels
from ..plonk.proving_key import fr_mont


def prewarm_prover(prover) -> None:
    """Materialize the prover's late-round jit shapes up front (CPU only)."""
    if jax.default_backend() != "cpu" or os.environ.get("AZTEC_NO_PREWARM"):
        return
    s = prover.settings
    n = prover.n
    L = prover.key.sigmas[f"sigma_{prover.width}"].monomial.shape[0]
    zero = jnp.zeros((L, n), jnp.uint32)

    k_zeta = k_shift = 0
    for info in s.polynomial_manifest:
        if not info.is_linearised or not s.use_linearisation:
            k_zeta += 1
        if info.requires_shifted_evaluation:
            k_shift += 1
    k_open = prover.width + k_zeta + (1 if s.use_linearisation else 0)
    k_lin = 0
    if s.use_linearisation:
        zero_ev: Dict[str, int] = {}
        for info in s.polynomial_manifest:
            zero_ev[info.polynomial_label] = 1
            zero_ev[info.polynomial_label + "_omega"] = 1
        ch = {"alpha": 1, "beta": 1, "gamma": 1, "zeta": 1}
        k_lin = 2 + len(prover.flavor.selector_linear_scalars(zero_ev, ch))

    # the fused quotient is the biggest executable and its cache entry
    # never persists (serialize SIGSEGVs on modules this large), so it
    # recompiles every process — do it first, while young.  (Lookup flavors
    # need round-2/3 witness polys for their quotient; skip those here.)
    if not getattr(prover.flavor, "uses_lookups", False):
        zero4 = jnp.zeros((L, 4 * n), jnp.uint32)
        wf = {f"w_{i}": zero4 for i in range(1, prover.width + 1)}
        wf["z"] = zero4
        one = fr_mont(1)[:, None]
        num_alphas = getattr(prover.flavor, "num_alphas", 21)
        ch_mont = {
            "alpha": one,
            "alphas": jnp.stack([fr_mont(1)] * num_alphas, axis=1),
            "beta": one,
            "gamma": one,
            "delta": one,
        }
        qe = prover.flavor.quotient_evals(prover.key, wf, ch_mont, n)
        pfft.coset_ifft(qe, prover.key.large_domain).block_until_ready()

    zp_n = powers_table(fr_mont(2), n, FR)
    zp_4n = powers_table(fr_mont(2), 4 * n, FR)
    for k in sorted({k_zeta, k_shift, k_open, k_lin, 1} - {0}):
        st = jnp.stack([zero] * k, axis=1)
        sc = jnp.stack([fr_mont(0)] * k, axis=1)
        kernels.linear_combination(st, sc).block_until_ready()
        prover._eval_many(st, zp_n)
    prover._eval_many(jnp.zeros((L, 1, 4 * n), jnp.uint32), zp_4n)
    adj = zero.at[:, 0].set(
        limb.sub_mod(zero[:, :1], fr_mont(0)[:, None], FR)[:, 0]
    )
    kate_divide(adj, 2).block_until_ready()
