"""Prover work queue: the external-executor seam for FFT/MSM offload.

TPU-native equivalent of the reference's ``waffle::work_queue``
(plonk/proof_system/prover/work_queue.hpp:69-200): between Fiat-Shamir
barriers the prover enqueues typed bulk-math items (MSM / coset-FFT /
iFFT) instead of executing them inline.  An external executor — a pod
scheduler, a second host, or the mesh-sharded kernels in
``aztec_tpu.parallel`` — can drain the queue through the getter/putter
API; ``process_queue()`` is the built-in single-device executor and is
behavior-identical to inline dispatch.

Differences from the reference, by design:

- work items carry device arrays (jnp limb planes), not raw fr* pointers;
- data resolution is lazy (``get_*_data`` materializes the operand at
  drain time, so an IFFT item queued before an MSM on the same wire
  resolves correctly regardless of drain interleaving, matching the
  reference's tag-indirect lookups);
- the queue is the natural multi-chip dispatch point: see
  ``MeshExecutor`` below, which services MSM items with
  ``parallel.sharded_msm`` over a ``jax.sharding.Mesh``.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, List, Optional


class WorkType(enum.Enum):
    MSM = 1
    FFT = 2        # small-domain monomial -> 4n coset FFT
    IFFT = 3       # lagrange -> monomial
    SMALL_FFT = 4  # one n-sized quarter of a 4n coset FFT (4-way split)


@dataclasses.dataclass
class WorkItem:
    work_type: WorkType
    tag: str                      # transcript tag (MSM) or poly label
    get_data: Callable            # () -> operand arrays (lazy)
    put_result: Callable          # (result) -> None (store / transcript)
    size: int = 0                 # MSM length hint (reference: `constant`)
    index: int = 0                # SMALL_FFT coset quarter j in 0..3
                                  # (reference: work_item::index)


@dataclasses.dataclass
class WorkItemInfo:
    """ref: work_queue.hpp:17-21."""

    num_scalar_multiplications: int
    num_ffts: int
    num_iffts: int


class WorkQueue:
    """ref: work_queue.hpp:69-200 (getter/putter external-executor seam)."""

    def __init__(self, key=None):
        self.key = key
        self.items: List[WorkItem] = []

    # -- producer side (the prover) -----------------------------------------
    def add_to_queue(self, item: WorkItem):
        self.items.append(item)

    def flush_queue(self):
        self.items = []

    # -- consumer side (external executors) ---------------------------------
    def get_queued_work_item_info(self) -> WorkItemInfo:
        c = {t: 0 for t in WorkType}
        for it in self.items:
            c[it.work_type] += 1
        return WorkItemInfo(c[WorkType.MSM], c[WorkType.FFT], c[WorkType.IFFT])

    def _nth(self, work_type: WorkType, i: int) -> WorkItem:
        k = 0
        for it in self.items:
            if it.work_type == work_type:
                if k == i:
                    return it
                k += 1
        raise IndexError(f"no {work_type} item {i}")

    def get_scalar_multiplication_data(self, i: int):
        """(16, m) canonical scalar planes for MSM item i
        (ref: work_queue.hpp:69-81 returns the fr* scalar buffer)."""
        return self._nth(WorkType.MSM, i).get_data()

    def get_scalar_multiplication_size(self, i: int) -> int:
        return self._nth(WorkType.MSM, i).size

    def put_scalar_multiplication_data(self, result, i: int):
        """result: affine (x, y) host ints or None (infinity); writes the
        commitment into the prover transcript
        (ref: work_queue.hpp:147-160)."""
        self._nth(WorkType.MSM, i).put_result(result)

    def get_ifft_data(self, i: int):
        return self._nth(WorkType.IFFT, i).get_data()

    def put_ifft_data(self, result, i: int):
        self._nth(WorkType.IFFT, i).put_result(result)

    def get_fft_data(self, i: int):
        return self._nth(WorkType.FFT, i).get_data()

    def put_fft_data(self, result, i: int):
        self._nth(WorkType.FFT, i).put_result(result)

    def get_small_fft_data(self, i: int):
        """(monomial (L, n) planes, coset quarter j) for SMALL_FFT item i
        (ref: work_queue.hpp:166-200, the WASM 4-way coset split)."""
        it = self._nth(WorkType.SMALL_FFT, i)
        return it.get_data(), it.index

    def put_small_fft_data(self, result, i: int):
        self._nth(WorkType.SMALL_FFT, i).put_result(result)

    # -- 4-way coset split ---------------------------------------------------
    def expand_small_ffts(self):
        """Replace every FFT item with FOUR independent SMALL_FFT quarter
        items — the reference's work_queue.hpp:166-200 split, and the seam
        a sharded/multi-host executor uses to fan one 4n coset FFT across
        devices.  Quarter j computes the n-point coset FFT at generator
        g * w_{4n}^j, i.e. the large-domain evaluations at indices
        m = 4k + j.  When all four quarters of an item have reported, the
        interleaved (L, 4n) result is handed to the ORIGINAL put_result.
        """
        import jax.numpy as jnp

        new_items: List[WorkItem] = []
        for it in self.items:
            if it.work_type != WorkType.FFT:
                new_items.append(it)
                continue

            slots = [None, None, None, None]
            orig_put = it.put_result

            def make_put(j, slots=slots, orig_put=orig_put):
                def put(result):
                    slots[j] = result
                    if all(s is not None for s in slots):
                        # out[:, 4k+j] = slots[j][:, k]
                        inter = jnp.stack(slots, axis=-1)
                        L = inter.shape[0]
                        orig_put(inter.reshape(L, -1))
                return put

            for j in range(4):
                new_items.append(WorkItem(
                    WorkType.SMALL_FFT, it.tag, it.get_data,
                    make_put(j), index=j))
        self.items = new_items

    # -- built-in executor ----------------------------------------------------
    def process_queue(self, executor: Optional["Executor"] = None):
        """Drain every item (ref: work_queue.hpp:208-280).  ``executor``
        overrides how each work type is serviced; unhandled types fall
        back to the local device kernels."""
        import os

        log = os.environ.get("AZTEC_PROVER_LOG")
        for it in self.items:
            if log:
                import sys
                import time

                t0 = time.perf_counter()
            if executor is not None and executor.handle(self.key, it):
                pass
            else:
                _local_execute(self.key, it)
            if log:
                print(f"#   queue {it.work_type.name} {it.tag}: "
                      f"{time.perf_counter() - t0:.2f}s",
                      file=sys.stderr, flush=True)
        self.flush_queue()


class Executor:
    """External-executor interface: return True when the item was
    serviced (its put_result must have been called)."""

    def handle(self, key, item: WorkItem) -> bool:  # pragma: no cover
        raise NotImplementedError


def _local_execute(key, it: WorkItem):
    if it.work_type == WorkType.MSM:
        from ..curves import group
        from ..curves.spec import BN254_G1
        from ..ff import limb
        from ..msm.pippenger import msm
        from ..numeric.bigint import limbs_to_int

        import numpy as np

        scalars = it.get_data()
        m = scalars.shape[1]
        X, Y = key.srs.get_monomials(m)
        P = msm((X, Y), scalars, BN254_G1)
        x, y, inf = group.to_affine(P, BN254_G1.field)
        if bool(np.asarray(inf)[0]):
            it.put_result(None)
            return
        xc = limbs_to_int(np.asarray(limb.from_mont(x, BN254_G1.field))[:, 0])
        yc = limbs_to_int(np.asarray(limb.from_mont(y, BN254_G1.field))[:, 0])
        it.put_result((xc, yc))
    elif it.work_type == WorkType.IFFT:
        from ..poly import fft_ops as pfft

        it.put_result(pfft.ifft(it.get_data(), key.small_domain))
    elif it.work_type == WorkType.FFT:
        from ..poly import fft_ops as pfft

        it.put_result(pfft.coset_fft(key._extend(it.get_data()),
                                     key.large_domain))
    elif it.work_type == WorkType.SMALL_FFT:
        it.put_result(small_fft_quarter(key, it.get_data(), it.index))
    else:  # pragma: no cover
        raise ValueError(it.work_type)


def small_fft_quarter(key, mono, j: int):
    """Quarter j of the 4n coset FFT of an (L, n) monomial: the n-point
    coset FFT with generator g * w_{4n}^j (large-domain indices 4k + j).
    Exact for degree < n, which every queued monomial satisfies (the FFT
    path zero-extends the same (L, n) planes)."""
    from ..poly import fft_ops as pfft
    from ..ff.bn254 import FR_MOD

    g = key.small_domain.generator
    w4n = key.large_domain.root
    gen = g * pow(w4n, j, FR_MOD) % FR_MOD
    return pfft.coset_fft(mono, key.small_domain, generator=gen)


class MeshExecutor(Executor):
    """Services MSM items with the mesh-sharded Pippenger
    (parallel/sharded_msm.py) — the multi-chip offload point the
    reference's work_queue was built for (work_queue.hpp:166-200)."""

    def __init__(self, mesh, axis: str = "dp"):
        self.mesh = mesh
        self.axis = axis

    def handle(self, key, item: WorkItem) -> bool:
        if item.work_type == WorkType.SMALL_FFT:
            # one coset quarter per device: computation follows placement
            import jax

            dev = self.mesh.devices.reshape(-1)[item.index
                                                % self.mesh.size]
            mono = jax.device_put(item.get_data(), dev)
            item.put_result(small_fft_quarter(key, mono, item.index))
            return True
        if item.work_type != WorkType.MSM:
            return False
        import numpy as np

        from ..curves import group
        from ..curves.spec import BN254_G1
        from ..ff import limb
        from ..numeric.bigint import limbs_to_int
        from ..parallel.sharded_msm import sharded_msm

        scalars = item.get_data()
        m = scalars.shape[1]
        X, Y = key.srs.get_monomials(m)
        P = sharded_msm(self.mesh, self.axis, (X, Y), scalars, BN254_G1)
        x, y, inf = group.to_affine(P, BN254_G1.field)
        if bool(np.asarray(inf)[0]):
            item.put_result(None)
            return True
        xc = limbs_to_int(np.asarray(limb.from_mont(x, BN254_G1.field))[:, 0])
        yc = limbs_to_int(np.asarray(limb.from_mont(y, BN254_G1.field))[:, 0])
        item.put_result((xc, yc))
        return True
