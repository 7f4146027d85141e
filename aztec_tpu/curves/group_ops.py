"""Group-operation bundles: the abstract interface the MSM engine consumes.

``JacobianOps`` is the real elliptic-curve instantiation (points = tuples of
Montgomery limb planes).  ``IntModOps`` is a mock group (Z_m, +) with the same
tuple-of-arrays calling convention — the MSM engine is group-generic, so all
of its sorting/raking/scatter logic can be unit-tested against plain integer
sums in milliseconds (no 256-bit compile costs).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ff import limb
from ..ff.spec import FieldSpec
from . import group
from . import group_pallas as gp
from .spec import CurveSpec


@dataclasses.dataclass(frozen=True)
class JacobianOps:
    """Real group ops bundle.

    On TPU, wide batches route through the fused Pallas kernels
    (curves/group_pallas.py, bit-identical results); narrow batches and
    other backends use the jnp formulas in curves/group.py.
    """

    curve: CurveSpec

    @property
    def spec(self) -> FieldSpec:
        return self.curve.field

    def infinity(self, batch_shape=()):
        return group.infinity(self.spec, batch_shape)

    def dbl(self, P):
        return group.dbl(P, self.spec)

    def add_unsafe(self, P, Q):
        if gp.enabled(P):
            return gp.add_unsafe(P, Q, self.spec)
        return group.add_unsafe(P, Q, self.spec)

    def add_complete(self, P, Q):
        return group.add_complete(P, Q, self.spec)

    def mixed_add_unsafe(self, P, Qa):
        if gp.enabled(P):
            return gp.mixed_add_unsafe(P, Qa, self.spec)
        return group.mixed_add_unsafe(P, Qa, self.spec)

    def from_affine(self, Qa):
        return group.from_affine(Qa, self.spec)

    def select(self, mask, P, Q):
        return tuple(limb.select(mask, a, b) for a, b in zip(P, Q))

    def mask_to_infinity(self, keep_mask, P):
        """Z=0 where ~keep."""
        X, Y, Z = P
        return (X, Y, jnp.where(keep_mask[None], Z, jnp.zeros_like(Z)))

    def zeros_like(self, P):
        return tuple(jnp.zeros_like(a) for a in P)

    # complete homogeneous-projective ops (RCB16) — the MSM bucket phase
    # runs on these: one branchless formula, sound for all inputs
    def c_infinity(self, batch_shape=()):
        return group.proj_infinity(self.spec, batch_shape)

    def c_add(self, P, Q):
        if gp.enabled(P) or gp.enabled(Q):
            return gp.proj_add_complete(P, Q, self.spec, self.curve.b)
        return group.proj_add_complete(P, Q, self.spec, self.curve.b)

    def c_dbl(self, P):
        if gp.enabled(P):
            return gp.proj_dbl(P, self.spec, self.curve.b)
        return group.proj_dbl(P, self.spec, self.curve.b)

    def c_dbl_n(self, P, steps: int):
        """steps successive complete doublings (fused on TPU)."""
        if gp.enabled(P):
            return gp.proj_dbl_n(P, self.spec, self.curve.b, steps)
        for _ in range(steps):
            P = group.proj_dbl(P, self.spec, self.curve.b)
        return P

    def j2c(self, P):
        if gp.enabled(P):
            return gp.jacobian_to_proj(P, self.spec)
        return group.jacobian_to_proj(P, self.spec)

    def c2j(self, P):
        if gp.enabled(P):
            return gp.proj_to_jacobian(P, self.spec)
        return group.proj_to_jacobian(P, self.spec)

    def c_mask_to_infinity(self, keep_mask, P):
        return group.proj_mask_to_infinity(keep_mask, P, self.spec)

    def rake_scan(self, sd, pts, B: int, K: int):
        """Fused MSM rake scan (msm/rake_pallas.py) when supported, else
        None (caller falls back to the generic lax.scan composition)."""
        if not gp.enabled(pts) or len(pts) != 2:
            return None
        from ..msm import rake_pallas

        return rake_pallas.rake_scan(sd, pts, B, K, self.spec)

    def pack_affine(self, pts, force: bool = False):
        """Affine table with limb pairs packed per u32 ((16, n): X pairs in
        rows 0-7, Y pairs in 8-15), or None off-TPU.  Halves per-round MSM
        gather elements (msm/pippenger.py round_body).  ``force`` packs
        regardless of backend (the chunked/sharded drivers run the packed
        pipeline everywhere via the rake_scan_packed XLA fallback)."""
        if not force and (not gp.enabled(pts) or len(pts) != 2):
            return None
        X, Y = pts
        return jnp.concatenate(
            [p[0::2] | (p[1::2] << jnp.uint32(16)) for p in (X, Y)], axis=0
        )

    def rake_scan_packed(self, dig_k, packed_k, B: int, K: int):
        if gp.enabled():
            from ..msm import rake_pallas

            return rake_pallas.rake_scan_packed(dig_k, packed_k, B, K,
                                                self.spec)
        return _rake_scan_packed_xla(self, dig_k, packed_k, B, K)

    def bucket_phase(self, buckets, nbuckets: int, acc=None,
                     dbl_steps: int = 0):
        """Fused bucket phase (msm/bucket_pallas.py) from JACOBIAN bucket
        planes; with ``acc`` it also folds the per-round accumulator shift
        (acc' = 2^dbl_steps acc + W).  None when unsupported (caller uses
        the XLA composition)."""
        if not gp.enabled(buckets):
            return None
        from ..msm import bucket_pallas

        return bucket_pallas.bucket_phase(buckets, nbuckets, self.spec,
                                          self.curve.b, acc, dbl_steps)


def _rake_scan_packed_xla(ops, dig_k, packed_k, B: int, K: int):
    """XLA fallback for the fused packed rake kernel (off-TPU: CPU-mesh
    dryruns / tests).  Bit-identical semantics: unpack the limb-pair rows
    back to affine planes and run the generic lax.scan composition,
    returning Jacobian running partials as 3 x (16, n) in the same
    K-major column layout (col = k*B + b) the fused kernel emits."""
    from jax import lax

    n = K * B
    dk = dig_k.reshape(K, B)
    pk = packed_k.reshape(16, K, B)
    lo = pk & jnp.uint32(0xFFFF)
    hi = pk >> jnp.uint32(16)
    # row pairs: packed row i holds limbs (2i, 2i+1) of X (i<8) / Y (i-8)
    X = jnp.stack(
        [lo[i // 2] if i % 2 == 0 else hi[i // 2] for i in range(16)], axis=0
    )  # (16, K, B)
    Y = jnp.stack(
        [lo[8 + i // 2] if i % 2 == 0 else hi[8 + i // 2]
         for i in range(16)], axis=0
    )
    Xk = jnp.moveaxis(X, 1, 0)  # (K, 16, B)
    Yk = jnp.moveaxis(Y, 1, 0)

    sentinel = jnp.full((B,), 0x1FFFF, jnp.uint32)
    inf = ops.infinity((B,))

    def step(carry, xs):
        accP, accd = carry
        dkr, Xr, Yr = xs
        same = dkr == accd
        added = ops.mixed_add_unsafe(accP, (Xr, Yr))
        fresh = ops.from_affine((Xr, Yr))
        newP = ops.select(same, added, fresh)
        return (newP, dkr), newP

    (_, _), stacked = lax.scan(step, (inf, sentinel), (dk, Xk, Yk))
    # stacked: 3 coords of (K, 16, B) -> (16, K*B/128, 128) K-major,
    # matching the fused kernel's output shape exactly
    return tuple(
        jnp.moveaxis(s, 0, 1).reshape(16, n // 128, 128) for s in stacked
    )


@dataclasses.dataclass(frozen=True)
class IntModOps:
    """Mock additive group (Z_m, +); 'points' are 1-tuples of (1, *b) uint32."""

    m: int = 1_000_003

    def infinity(self, batch_shape=()):
        return (jnp.zeros((1,) + tuple(batch_shape), jnp.uint32),)

    def dbl(self, P):
        return ((P[0] * 2) % self.m,)

    def add_unsafe(self, P, Q):
        return ((P[0] + Q[0]) % self.m,)

    add_complete = add_unsafe
    mixed_add_unsafe = add_unsafe

    def from_affine(self, Qa):
        return Qa

    def select(self, mask, P, Q):
        return tuple(jnp.where(mask[None], a, b) for a, b in zip(P, Q))

    def mask_to_infinity(self, keep_mask, P):
        return tuple(jnp.where(keep_mask[None], a, jnp.zeros_like(a)) for a in P)

    # "projective" aliases: the mock group has one representation
    c_infinity = infinity
    c_add = add_unsafe
    c_dbl = dbl

    def c_dbl_n(self, P, steps: int):
        for _ in range(steps):
            P = self.dbl(P)
        return P

    def rake_scan(self, sd, pts, B, K):
        return None

    def pack_affine(self, pts, force: bool = False):
        return None

    def bucket_phase(self, buckets, nbuckets, acc=None, dbl_steps=0):
        return None

    def j2c(self, P):
        return P

    c2j = j2c
    c_mask_to_infinity = mask_to_infinity
