"""Work-queue external-executor seam (ref: work_queue.hpp:69-200).

Mechanics are tested with stub items (no device math); the end-to-end
test proves a circuit twice — built-in executor vs an external executor
that services every MSM through the getter/putter API with host golden
scalar multiplication — and requires byte-identical proofs.
"""

import numpy as np
import pytest

from aztec_tpu.plonk.work_queue import (
    Executor, WorkItem, WorkQueue, WorkType)


def test_queue_counts_and_order():
    q = WorkQueue()
    log = []
    q.add_to_queue(WorkItem(WorkType.IFFT, "w_1", lambda: "lag1",
                            lambda r: log.append(("ifft", r))))
    q.add_to_queue(WorkItem(WorkType.MSM, "W_1", lambda: "sc1",
                            lambda r: log.append(("msm", r)), size=32))
    q.add_to_queue(WorkItem(WorkType.FFT, "w_1", lambda: "mono1",
                            lambda r: log.append(("fft", r))))
    info = q.get_queued_work_item_info()
    assert (info.num_scalar_multiplications, info.num_ffts,
            info.num_iffts) == (1, 1, 1)
    assert q.get_scalar_multiplication_data(0) == "sc1"
    assert q.get_scalar_multiplication_size(0) == 32
    assert q.get_ifft_data(0) == "lag1"
    assert q.get_fft_data(0) == "mono1"
    q.put_scalar_multiplication_data((1, 2), 0)
    assert log == [("msm", (1, 2))]
    with pytest.raises(IndexError):
        q.get_scalar_multiplication_data(1)
    q.flush_queue()
    assert q.get_queued_work_item_info().num_scalar_multiplications == 0


def test_external_executor_is_consulted_first():
    q = WorkQueue()
    got = []

    class Grabber(Executor):
        def handle(self, key, item):
            if item.work_type == WorkType.MSM:
                item.put_result("external")
                return True
            return False

    q.add_to_queue(WorkItem(WorkType.MSM, "W_1", lambda: "sc",
                            lambda r: got.append(r)))
    q.process_queue(Grabber())
    assert got == ["external"]
    assert q.get_queued_work_item_info().num_scalar_multiplications == 0


class GoldenMSMExecutor(Executor):
    """Services MSM items via the getter/putter API with host golden
    group math — an 'external' device with no shared code path."""

    def __init__(self):
        self.serviced = 0

    def handle(self, key, item):
        if item.work_type != WorkType.MSM:
            return False
        from aztec_tpu.curves import golden
        from aztec_tpu.curves.spec import BN254_G1
        from aztec_tpu.ff import limb
        from aztec_tpu.numeric.bigint import limbs_to_ints

        scalars = limbs_to_ints(np.asarray(item.get_data()))
        m = len(scalars)
        X, Y = key.srs.get_monomials(m)
        xs = limbs_to_ints(np.asarray(limb.from_mont(X, BN254_G1.field)))
        ys = limbs_to_ints(np.asarray(limb.from_mont(Y, BN254_G1.field)))
        g = golden.GoldenCurve(BN254_G1)
        acc = None
        for s, p in zip(scalars, zip(xs, ys)):
            if s == 0:
                continue
            t = g.mul(s, p)
            acc = t if acc is None else g.add(acc, t)
        item.put_result(acc)
        self.serviced += 1
        return True


def _tiny_circuit(cls):
    from aztec_tpu.plonk.composer import MulTriple

    c = cls()
    c.create_dummy_gates()
    c.add_public_variable(123)
    x = c.add_variable(3)
    y = c.add_variable(4)
    z = c.add_variable(12)
    c.create_mul_gate(MulTriple(x, y, z, 1, -1, 0))
    return c


def test_prover_external_msm_executor_byte_identical():
    """The same circuit proved with the built-in executor and with every
    MSM offloaded through the seam must produce identical proof bytes
    (rng pinned).  Exercises the real prover integration."""
    from aztec_tpu.plonk.composer import StandardComposer

    def fixed_rng():
        state = [7]

        def f():
            state[0] = (state[0] * 6364136223846793005 + 1) % (1 << 64)
            return state[0]
        return f

    c1 = _tiny_circuit(StandardComposer)
    p1 = c1.create_prover()
    p1.rng = fixed_rng()
    proof1 = p1.construct_proof()
    assert c1.create_verifier().verify_proof(proof1)

    c2 = _tiny_circuit(StandardComposer)
    p2 = c2.create_prover()
    p2.rng = fixed_rng()
    ex = GoldenMSMExecutor()
    p2.executor = ex
    proof2 = p2.construct_proof()

    assert ex.serviced >= 5  # 3 wires + Z + T splits + PI_Z + PI_Z_OMEGA
    assert proof1 == proof2


def test_small_fft_split_matches_direct_coset_fft():
    """expand_small_ffts must turn one FFT item into four SMALL_FFT
    quarters whose interleaved results equal the direct 4n coset FFT
    (ref: work_queue.hpp:166-200, the WASM 4-way split)."""
    import jax.numpy as jnp

    from aztec_tpu.ff import FR, limb
    from aztec_tpu.ff.bn254 import FR_MOD
    from aztec_tpu.numeric.bigint import ints_to_limbs
    from aztec_tpu.poly import fft_ops as pfft
    from aztec_tpu.poly.domain import EvaluationDomain

    n = 16

    class Key:
        small_domain = EvaluationDomain(n)
        large_domain = EvaluationDomain(4 * n)

        def _extend(self, mono):
            pad = jnp.zeros((mono.shape[0], 3 * n), jnp.uint32)
            return jnp.concatenate([mono, pad], axis=1)

    key = Key()
    rng = np.random.default_rng(11)
    mono = limb.to_mont(jnp.asarray(ints_to_limbs(
        [int(v) % FR_MOD for v in rng.integers(1, 1 << 62, size=n)])), FR)

    direct = pfft.coset_fft(key._extend(mono), key.large_domain)

    got = []
    q = WorkQueue(key)
    q.add_to_queue(WorkItem(WorkType.FFT, "w_1", lambda: mono,
                            lambda r: got.append(r)))
    q.expand_small_ffts()
    info = q.get_queued_work_item_info()
    assert info.num_ffts == 0
    assert len(q.items) == 4
    # quarters must be independently addressable through the getter API
    for i in range(4):
        data, j = q.get_small_fft_data(i)
        assert j == i and data is mono
    q.process_queue()
    assert len(got) == 1
    assert np.array_equal(np.asarray(got[0]), np.asarray(direct))


def test_small_fft_quarters_distributable():
    """Each quarter can be serviced out of order by an external executor
    (simulating per-device dispatch) and the assembly still fires once,
    with the correct interleave."""
    import jax.numpy as jnp

    from aztec_tpu.ff import FR, limb
    from aztec_tpu.ff.bn254 import FR_MOD
    from aztec_tpu.numeric.bigint import ints_to_limbs
    from aztec_tpu.plonk.work_queue import small_fft_quarter
    from aztec_tpu.poly import fft_ops as pfft
    from aztec_tpu.poly.domain import EvaluationDomain

    n = 16

    class Key:
        small_domain = EvaluationDomain(n)
        large_domain = EvaluationDomain(4 * n)

        def _extend(self, mono):
            pad = jnp.zeros((mono.shape[0], 3 * n), jnp.uint32)
            return jnp.concatenate([mono, pad], axis=1)

    key = Key()
    rng = np.random.default_rng(13)
    mono = limb.to_mont(jnp.asarray(ints_to_limbs(
        [int(v) % FR_MOD for v in rng.integers(1, 1 << 62, size=n)])), FR)
    direct = pfft.coset_fft(key._extend(mono), key.large_domain)

    got = []
    q = WorkQueue(key)
    q.add_to_queue(WorkItem(WorkType.FFT, "w_1", lambda: mono,
                            lambda r: got.append(r)))
    q.expand_small_ffts()
    for i in (2, 0, 3, 1):   # out-of-order external servicing
        data, j = q.get_small_fft_data(i)
        q.put_small_fft_data(small_fft_quarter(key, data, j), i)
    assert len(got) == 1
    assert np.array_equal(np.asarray(got[0]), np.asarray(direct))
