"""Fused Pallas TPU kernels for limb-plane field arithmetic.

The jnp path (limb.py) materializes a (16, 16, batch) outer product to HBM
for every Montgomery multiply — measured at ~9 ms for one width-32768
mont_mul on v5e (~20x its HBM speed-of-light; see PERF.md round-3 profile).
These kernels keep the entire REDC pipeline — schoolbook products, column
accumulation, ripple carries, conditional subtraction — in VMEM registers,
so a chained group formula (11 muls for a mixed add) touches HBM only for
its inputs and outputs.

Design (role of the reference's field_impl_x64.hpp MULX/ADOX kernels,
re-thought for a vector machine):

- An element batch is a (16, *batch) uint32 array of 16-bit limb planes,
  exactly as in limb.py; kernels are bit-compatible drop-ins.
- Batches are flattened and tiled to (16, 8*G, 128) blocks; inside the
  kernel each limb row is an (8, 128) tile — the native VPU shape — and a
  field element is a Python list of 16 such rows, entirely in
  registers/VMEM.
- Carries ripple sequentially over the 16 limb rows (16 vector steps):
  inside VMEM the O(L) ripple beats the O(log L) Kogge-Stone scan that the
  HBM-bound jnp path needs, because each step is one cheap VPU op.
- All values stay canonical (< p) at formula boundaries, so results are
  bit-identical to limb.py's (both produce the unique canonical
  representative).

`formula builders` below (KF methods) are consumed by curves/group_pallas.py
to emit whole-group-operation kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import FieldSpec

L = 16
# numpy scalars inline as literals inside pallas kernels (jnp scalars would
# be captured constants, which pallas_call rejects)
MASK16 = np.uint32(0xFFFF)
BLOCK = 1024  # elements per grid step: rows are (8, 128) tiles


def _u32(x: int) -> np.uint32:
    return np.uint32(x)


class KF:
    """In-kernel field helper bound to one FieldSpec.

    Elements are lists of 16 uint32 arrays (one per limb plane), each of
    whatever tile shape the kernel block uses (normally (8, 128)).
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.p = [int(x) for x in spec.p_limbs]
        self.pp = [int(x) for x in spec.pprime_limbs]
        self.comp_p = [int(x) for x in spec.comp_p_limbs]
        self.one_mont = [int(x) for x in spec.one_mont_limbs]

    # ---- primitive helpers ----

    @staticmethod
    def canon(cols):
        """Ripple-canonicalize redundant columns (< 2**22 each) to 16-bit
        digits.  Returns (digits, carry_out)."""
        out = []
        carry = None
        for c in cols:
            v = c if carry is None else c + carry
            out.append(v & MASK16)
            carry = v >> 16
        return out, carry

    @staticmethod
    def mul_cols(a, b, ncols=2 * L):
        """Schoolbook product -> ncols redundant columns (each < 2**21)."""
        cols = [None] * ncols
        for i in range(L):
            for j in range(L):
                k = i + j
                if k >= ncols:
                    continue
                prod = a[i] * b[j]
                lo = prod & MASK16
                cols[k] = lo if cols[k] is None else cols[k] + lo
                if k + 1 < ncols:
                    hi = prod >> 16
                    cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
        z = jnp.zeros_like(a[0])
        return [z if c is None else c for c in cols]

    @staticmethod
    def sqr_cols(a, ncols=2 * L):
        """Squaring: symmetric products doubled (~half the multiplies)."""
        cols = [None] * ncols

        def acc(k, v):
            if k < ncols:
                cols[k] = v if cols[k] is None else cols[k] + v

        for i in range(L):
            prod = a[i] * a[i]
            acc(2 * i, prod & MASK16)
            acc(2 * i + 1, prod >> 16)
            for j in range(i + 1, L):
                if i + j >= ncols:
                    continue
                prod = a[i] * a[j]
                acc(i + j, (prod & MASK16) * _u32(2))
                acc(i + j + 1, (prod >> 16) * _u32(2))
        z = jnp.zeros_like(a[0])
        return [z if c is None else c for c in cols]

    def mul_const_cols(self, a, const_limbs, ncols=2 * L):
        """a * constant (16-bit limb list of python ints); zero limbs free."""
        cols = [None] * ncols
        for j, cj in enumerate(const_limbs):
            if cj == 0:
                continue
            cjv = _u32(cj)
            for i in range(L):
                k = i + j
                if k >= ncols:
                    continue
                prod = a[i] * cjv
                lo = prod & MASK16
                cols[k] = lo if cols[k] is None else cols[k] + lo
                if k + 1 < ncols:
                    hi = prod >> 16
                    cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
        z = jnp.zeros_like(a[0])
        return [z if c is None else c for c in cols]

    # ---- canonical field ops (bit-compatible with limb.py) ----

    def cond_sub_p(self, t):
        """t canonical in [0, 2p) -> t mod p  (limb.cond_sub_p)."""
        y, co = self.canon([t[i] + _u32(self.comp_p[i]) for i in range(L)])
        take = co != 0
        return [jnp.where(take, y[i], t[i]) for i in range(L)]

    def add(self, a, b):
        s, _ = self.canon([a[i] + b[i] for i in range(L)])
        return self.cond_sub_p(s)

    def sub(self, a, b):
        cols = [a[i] + (MASK16 - b[i]) for i in range(L)]
        cols[0] = cols[0] + _u32(1)
        z, co = self.canon(cols)
        underflow = co == 0
        padd = [
            jnp.where(underflow, _u32(self.p[i]), _u32(0)) for i in range(L)
        ]
        r, _ = self.canon([z[i] + padd[i] for i in range(L)])
        return r

    def _redc(self, T):
        """Separated REDC on 32 redundant columns (limb.mont_mul tail)."""
        Tlow, c16 = self.canon(T[:L])
        Thi = list(T[L:])
        Thi[0] = Thi[0] + c16
        m, _ = self.canon(self.mul_const_cols(Tlow, self.pp, ncols=L))
        MP = self.mul_const_cols(m, self.p, ncols=2 * L)
        U = [Tlow[i] + MP[i] for i in range(L)] + [
            Thi[i] + MP[L + i] for i in range(L)
        ]
        Uc, _ = self.canon(U)
        return self.cond_sub_p(Uc[L:])

    def mul(self, a, b):
        return self._redc(self.mul_cols(a, b))

    def sqr(self, a):
        return self._redc(self.sqr_cols(a))

    def mul_small(self, a, const_limbs):
        """a * small Montgomery constant given as limb ints (full REDC)."""
        return self._redc(self.mul_const_cols(a, const_limbs))

    # ---- structure helpers ----

    def zero(self, like):
        z = jnp.zeros_like(like[0])
        return [z] * L

    def one_mont_elem(self, like):
        return [jnp.full_like(like[0], np.uint32(c)) for c in self.one_mont]

    @staticmethod
    def select(mask, a, b):
        return [jnp.where(mask, x, y) for x, y in zip(a, b)]

    @staticmethod
    def is_zero(a):
        acc = a[0]
        for r in a[1:]:
            acc = acc | r
        return acc == 0

    @staticmethod
    def eq(a, b):
        acc = a[0] ^ b[0]
        for x, y in zip(a[1:], b[1:]):
            acc = acc | (x ^ y)
        return acc == 0


# --------------------------------------------------------------------------
# Elementwise kernel factory: formula over whole field elements.
# --------------------------------------------------------------------------


def _rows(ref):
    """Split a (16, 8, 128) block ref into 16 (8, 128) rows."""
    return [ref[i] for i in range(L)]


def _store(ref, rows):
    for i in range(L):
        ref[i] = rows[i]


@functools.lru_cache(maxsize=None)
def _elementwise_call(spec: FieldSpec, n_in: int, n_out: int, formula_key,
                      formula):
    """Build a jitted (16, nf, 128)-plane elementwise pallas op.

    ``formula(kf, elems) -> elems`` consumes/produces lists-of-rows field
    elements.  Cached per (spec, formula identity).
    """
    import os

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = os.environ.get("AZTEC_PALLAS") == "interpret"
    kf = KF(spec)

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:]
        elems = [_rows(r) for r in ins]
        res = formula(kf, elems)
        assert len(res) == n_out
        for ref, rows in zip(outs, res):
            _store(ref, rows)

    rows_per_block = BLOCK // 128

    @jax.jit
    def call(*arrs):
        nf = arrs[0].shape[1]
        grid = nf // rows_per_block
        spec_blk = pl.BlockSpec(
            (L, rows_per_block, 128), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((L, nf, 128), jnp.uint32)
                for _ in range(n_out)
            ),
            grid=(grid,),
            in_specs=[spec_blk] * n_in,
            out_specs=tuple(spec_blk for _ in range(n_out)),
            interpret=interpret,
        )(*arrs)

    return call


def elementwise_op(spec: FieldSpec, n_in: int, n_out: int, formula,
                   formula_key: str):
    """Wrap a KF formula as a batch op on (16, *batch) uint32 planes.

    Broadcasts all inputs to a common batch shape, flattens, pads to a
    BLOCK multiple, runs the fused kernel, unpads and reshapes back.
    """
    call = _elementwise_call(spec, n_in, n_out, formula_key, formula)

    def op(*arrs):
        bshape = jnp.broadcast_shapes(*(a.shape[1:] for a in arrs))
        n = int(np.prod(bshape)) if bshape else 1
        pad = (-n) % BLOCK
        flat = []
        for a in arrs:
            af = jnp.broadcast_to(a, (L,) + bshape).reshape(L, n)
            if pad:
                af = jnp.concatenate(
                    [af, jnp.zeros((L, pad), jnp.uint32)], axis=1
                )
            flat.append(af.reshape(L, (n + pad) // 128, 128))
        outs = call(*flat)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        res = tuple(
            o.reshape(L, n + pad)[:, :n].reshape((L,) + bshape) for o in outs
        )
        return res[0] if n_out == 1 else res

    return op


# --------------------------------------------------------------------------
# Public field entry points
# --------------------------------------------------------------------------


def _mont_mul_formula(kf: KF, elems):
    a, b = elems
    return [kf.mul(a, b)]


@functools.lru_cache(maxsize=None)
def _mont_mul_op(spec: FieldSpec):
    return elementwise_op(spec, 2, 1, _mont_mul_formula, "mont_mul")


def mont_mul(a, b, spec: FieldSpec):
    """Fused-Pallas Montgomery product; bit-compatible with limb.mont_mul."""
    return _mont_mul_op(spec)(a, b)


def _add_mod_formula(kf: KF, elems):
    return [kf.add(elems[0], elems[1])]


def _sub_mod_formula(kf: KF, elems):
    return [kf.sub(elems[0], elems[1])]


@functools.lru_cache(maxsize=None)
def _add_mod_op(spec: FieldSpec):
    return elementwise_op(spec, 2, 1, _add_mod_formula, "add_mod")


@functools.lru_cache(maxsize=None)
def _sub_mod_op(spec: FieldSpec):
    return elementwise_op(spec, 2, 1, _sub_mod_formula, "sub_mod")


def add_mod(a, b, spec: FieldSpec):
    """Fused-Pallas modular add; bit-compatible with limb.add_mod."""
    return _add_mod_op(spec)(a, b)


def sub_mod(a, b, spec: FieldSpec):
    """Fused-Pallas modular sub; bit-compatible with limb.sub_mod."""
    return _sub_mod_op(spec)(a, b)


def _mul_add_formula(kf: KF, elems):
    a, b, c = elems
    return [kf.add(kf.mul(a, b), c)]


@functools.lru_cache(maxsize=None)
def _mul_add_op(spec: FieldSpec):
    return elementwise_op(spec, 3, 1, _mul_add_formula, "mul_add")


def mul_add(a, b, c, spec: FieldSpec):
    """Fused a*b + c (one kernel, one HBM round trip)."""
    return _mul_add_op(spec)(a, b, c)


def _butterfly_formula(kf: KF, elems):
    top, bot, tw = elems
    t = kf.mul(bot, tw)
    return [kf.add(top, t), kf.sub(top, t)]


@functools.lru_cache(maxsize=None)
def _butterfly_op(spec: FieldSpec):
    return elementwise_op(spec, 3, 2, _butterfly_formula, "butterfly")


def butterfly(top, bot, tw, spec: FieldSpec):
    """Fused FFT butterfly: (top + tw*bot, top - tw*bot), one kernel.

    The jnp limb path pays a full HBM round trip of the (16, 16, batch)
    outer product per mont_mul (~268 ns/elem measured r3); this keeps the
    whole stage in VMEM at ~0.4 ns/elem — the difference between a 5.1 s
    and a ~40 ms 2^20 FFT (chip_probe fft, r5)."""
    return _butterfly_op(spec)(top, bot, tw)


def use_pallas(batch_elems: int | None = None) -> bool:
    """Dispatch policy: fused kernels on TPU (or interpret mode if forced)."""
    import os

    flag = os.environ.get("AZTEC_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "interpret":
        return True
    if jax.default_backend() != "tpu":
        return False
    return True
