"""Chunked MSM driver (msm/chunked.py): staging logic vs the mock group.

The chunked driver's new pieces — the round-batched bucket phase and the
Horner fold — are group-generic, so they are verified here against the
IntModOps mock group (plain modular integer sums) in milliseconds, the
same strategy the engine's own indexing tests use (tests/test_msm.py).
The curve instantiation is covered by the TPU bench correctness gate
(bench.py: host golden scalar-mul check) and tests/test_msm.py's engine
equivalence (same kernels, same formulas).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from aztec_tpu.curves.group_ops import IntModOps
from aztec_tpu.msm import chunked


@pytest.mark.parametrize("R,c_bits", [(8, 16), (2, 16)])
def test_bucket_phase_batched_mock(R, c_bits):
    m = 1_000_003
    ops = IntModOps(m)
    nb = 1 << c_bits
    rng = np.random.default_rng(11)
    B = rng.integers(0, m, (1, R, nb), dtype=np.uint32)
    # keep magnitudes small enough that j*B_j sums stay in uint64 on host
    W = chunked._bucket_phase_batched(
        ops, (jnp.asarray(B),), nb, min(64, nb // 1024))
    got = np.asarray(W[0][0])  # (R,)
    j = np.arange(nb, dtype=np.uint64)
    expect = (B[0].astype(np.uint64) * j[None, :] % m).sum(axis=1) % m
    assert np.array_equal(got.astype(np.uint64), expect)


def test_finish_horner_mock():
    m = 1_000_003
    ops = IntModOps(m)
    R, c = 4, 16
    nb = 1 << c
    rng = np.random.default_rng(12)
    B = rng.integers(0, m, (1, R, nb), dtype=np.uint32)
    out = chunked._finish(ops, (jnp.asarray(B),), R, c, nb,
                          return_jacobian=False)
    got = int(np.asarray(out[0])[0, 0])
    j = np.arange(nb, dtype=object)
    W = [(int((B[0, r].astype(object) * j).sum()) % m) for r in range(R)]
    expect = sum((1 << (c * r)) * W[r] for r in range(R)) % m
    assert got == expect


def test_geometry_gate():
    assert chunked.supported(17, True, 64, 16)
    assert chunked.supported(12, True, 4, 16)
    assert not chunked.supported(11, False, 64, 16)  # B = 32
