"""Host-side multiprecision helpers (TPU-native analog of reference numeric/).

The reference (numeric/uint256/uint256.hpp, numeric/uintx) provides 256/512-bit
integer types for the C++ scalar world.  On the TPU stack the device never
manipulates scalar big ints; it sees uint32 "limb-plane" arrays of shape
``(L, *batch)`` with L little-endian 16-bit digits per element.  This module is
the host boundary: converting between Python ints / binary blobs and limb
planes, plus the few big-int utilities needed for parameter derivation.
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
NLIMBS = 16  # 16 x 16 = 256 bits
MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(v: int, nlimbs: int = NLIMBS) -> np.ndarray:
    """One Python int -> (nlimbs,) uint32 little-endian 16-bit digits."""
    if v < 0:
        raise ValueError("negative")
    out = np.zeros((nlimbs,), np.uint32)
    for k in range(nlimbs):
        out[k] = (v >> (LIMB_BITS * k)) & MASK
    if v >> (LIMB_BITS * nlimbs):
        raise ValueError("value does not fit")
    return out


def ints_to_limbs(vals, nlimbs: int = NLIMBS) -> np.ndarray:
    """Iterable of ints -> (nlimbs, n) uint32 limb planes."""
    vals = list(vals)
    n = len(vals)
    # bulk path via fixed-width little-endian bytes
    nbytes = nlimbs * LIMB_BITS // 8
    buf = b"".join(int(v).to_bytes(nbytes, "little") for v in vals)
    return bytes_to_limbs(buf, n, nbytes)


def limbs_to_int(arr: np.ndarray) -> int:
    v = 0
    for k in range(arr.shape[0] - 1, -1, -1):
        v = (v << LIMB_BITS) | int(arr[k])
    return v


def limbs_to_ints(arr: np.ndarray) -> list:
    """(nlimbs, n) limb planes -> list of n Python ints."""
    arr = np.asarray(arr)
    n = arr.shape[1]
    return [limbs_to_int(arr[:, j]) for j in range(n)]


def bytes_to_limbs(buf: bytes, n: int, elem_bytes: int = 32) -> np.ndarray:
    """Little-endian fixed-width elements -> (elem_bytes//2, n) uint32 planes.

    Fast path used by the SRS reader (ref: srs/io.cpp byte handling).
    """
    a = np.frombuffer(buf, dtype=np.uint8, count=n * elem_bytes).reshape(n, elem_bytes)
    u16 = a.view("<u2")  # (n, elem_bytes//2) little-endian 16-bit digits
    return np.ascontiguousarray(u16.T).astype(np.uint32)


def limbs_to_bytes(arr: np.ndarray) -> bytes:
    """(L, n) uint32 limb planes -> concatenated little-endian 2L-byte elements."""
    arr = np.asarray(arr, dtype=np.uint32)
    u16 = arr.T.astype("<u2")  # (n, L)
    return u16.tobytes()
