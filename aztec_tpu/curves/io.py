"""Host <-> device conversion for point batches."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..numeric.bigint import ints_to_limbs, limbs_to_ints
from ..ff import limb
from .spec import CurveSpec


def affine_to_device(points, curve: CurveSpec):
    """List of (x, y) int tuples -> (X, Y) Montgomery limb planes (L, n)."""
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    X = limb.to_mont(jnp.asarray(ints_to_limbs(xs)), curve.field)
    Y = limb.to_mont(jnp.asarray(ints_to_limbs(ys)), curve.field)
    return X, Y


def jacobian_to_host(P, curve: CurveSpec):
    """Device Jacobian batch -> list of (x, y) tuples / None (infinity)."""
    from . import group

    x, y, inf = group.to_affine(P, curve.field)
    xs = limbs_to_ints(np.asarray(limb.from_mont(x, curve.field)))
    ys = limbs_to_ints(np.asarray(limb.from_mont(y, curve.field)))
    inf = np.asarray(inf)
    return [None if inf[i] else (xs[i], ys[i]) for i in range(len(xs))]


def affine_device_to_host(Qa, curve: CurveSpec):
    X, Y = Qa
    xs = limbs_to_ints(np.asarray(limb.from_mont(X, curve.field)))
    ys = limbs_to_ints(np.asarray(limb.from_mont(Y, curve.field)))
    return list(zip(xs, ys))
