"""ctypes bindings for the flat C ABI (native/src/c_bind.cpp).

The framework's analog of the reference's c_bind surface
(crypto/pedersen/c_bind.cpp, crypto/blake2s/c_bind.cpp,
crypto/schnorr/c_bind.cpp): native host crypto behind byte-buffer entry
points.  Field elements are 32-byte big-endian; points x||y (64 bytes);
infinity is all-zero.  Proving entry points (prover/c_bind.cpp in the
reference) map to the serving worker protocol instead — see
serving/proof_worker.py.
"""

from __future__ import annotations

import ctypes
import os
import secrets
import subprocess
from typing import List, Optional, Tuple

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src")
_LIB = os.path.join(_DIR, "libaztec_cbind.so")

_lib = None

_P = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001


def _build():
    src = os.path.join(_SRC, "c_bind.cpp")
    deps = [src] + [
        os.path.join(_SRC, h)
        for h in ("field256.hpp", "grumpkin.hpp", "hashes.hpp")
    ]
    if os.path.exists(_LIB) and all(
        os.path.getmtime(_LIB) >= os.path.getmtime(d) for d in deps
    ):
        return
    subprocess.check_call(
        ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _LIB, src]
    )


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    _build()
    lib = ctypes.CDLL(_LIB)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    size_t = ctypes.c_size_t
    u32 = ctypes.c_uint32

    lib.pedersen__compress_fields.argtypes = [u8p, u8p, u8p]
    lib.pedersen__compress.argtypes = [u8p, u32, u32, u8p]
    lib.pedersen__commit.argtypes = [u8p, u32, u32, u8p]
    lib.pedersen__buffer_to_field.argtypes = [u8p, size_t, u8p]
    lib.pedersen__fixed_base_scalar_mul.argtypes = [u8p, u32, u32, u8p]
    lib.pedersen__get_generator.argtypes = [u32, u8p]
    lib.blake2s__hash.argtypes = [u8p, size_t, u8p]
    lib.blake2s_to_field.argtypes = [u8p, size_t, u8p]
    lib.keccak256__hash.argtypes = [u8p, size_t, u8p]
    lib.schnorr__compute_public_key.argtypes = [u8p, u8p]
    lib.schnorr__construct_signature.argtypes = [u8p, size_t, u8p, u8p, u8p, u8p]
    lib.schnorr__verify_signature.restype = ctypes.c_int
    lib.schnorr__verify_signature.argtypes = [u8p, size_t, u8p, u8p, u8p]
    _lib = lib
    return lib


def _buf(data: bytes):
    return (ctypes.c_uint8 * len(data)).from_buffer_copy(data) if data else \
        ctypes.cast(0, ctypes.POINTER(ctypes.c_uint8))


def _out(n: int):
    return (ctypes.c_uint8 * n)()


def _field(v: int) -> bytes:
    return (v % _P).to_bytes(32, "big")


def _point_to_tuple(raw: bytes) -> Optional[Tuple[int, int]]:
    x = int.from_bytes(raw[:32], "big")
    y = int.from_bytes(raw[32:], "big")
    return None if x == 0 and y == 0 else (x, y)


# ------------------------------ pedersen -------------------------------------

def compress_fields(left: int, right: int) -> int:
    lib = load()
    out = _out(32)
    lib.pedersen__compress_fields(_buf(_field(left)), _buf(_field(right)), out)
    return int.from_bytes(bytes(out), "big")


def compress_many(inputs: List[int], hash_index: int = 0) -> int:
    lib = load()
    data = b"".join(_field(v) for v in inputs)
    out = _out(32)
    lib.pedersen__compress(_buf(data), len(inputs), hash_index, out)
    return int.from_bytes(bytes(out), "big")


def commit(inputs: List[int], hash_index: int = 0):
    lib = load()
    data = b"".join(_field(v) for v in inputs)
    out = _out(64)
    lib.pedersen__commit(_buf(data), len(inputs), hash_index, out)
    return _point_to_tuple(bytes(out)) or (0, 0)


def buffer_to_field(data: bytes) -> int:
    lib = load()
    out = _out(32)
    lib.pedersen__buffer_to_field(_buf(data), len(data), out)
    return int.from_bytes(bytes(out), "big")


def fixed_base_scalar_mul(value: int, num_bits: int = 254,
                          generator_index: int = 0):
    lib = load()
    out = _out(64)
    lib.pedersen__fixed_base_scalar_mul(
        _buf(_field(value)), generator_index, num_bits, out)
    return _point_to_tuple(bytes(out))


def get_generator(index: int) -> Tuple[int, int]:
    lib = load()
    out = _out(64)
    lib.pedersen__get_generator(index, out)
    return _point_to_tuple(bytes(out))


# ------------------------------ hashes ---------------------------------------

def blake2s(data: bytes) -> bytes:
    lib = load()
    out = _out(32)
    lib.blake2s__hash(_buf(data), len(data), out)
    return bytes(out)


def blake2s_to_field(data: bytes) -> int:
    lib = load()
    out = _out(32)
    lib.blake2s_to_field(_buf(data), len(data), out)
    return int.from_bytes(bytes(out), "big")


def keccak256(data: bytes) -> bytes:
    lib = load()
    out = _out(32)
    lib.keccak256__hash(_buf(data), len(data), out)
    return bytes(out)


# ------------------------------ schnorr --------------------------------------

def compute_public_key(private_key: int) -> Tuple[int, int]:
    lib = load()
    out = _out(64)
    lib.schnorr__compute_public_key(_buf(private_key.to_bytes(32, "big")), out)
    return _point_to_tuple(bytes(out))


def construct_signature(message: bytes, private_key: int,
                        k: int | None = None) -> Tuple[bytes, bytes]:
    lib = load()
    _Q = 0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47
    if k is None:
        k = secrets.randbelow(_Q - 1) + 1
    s = _out(32)
    e = _out(32)
    lib.schnorr__construct_signature(
        _buf(message), len(message), _buf(private_key.to_bytes(32, "big")),
        _buf(k.to_bytes(32, "big")), s, e)
    return bytes(s), bytes(e)


def verify_signature(message: bytes, public_key: Tuple[int, int],
                     sig: Tuple[bytes, bytes]) -> bool:
    lib = load()
    pub = public_key[0].to_bytes(32, "big") + public_key[1].to_bytes(32, "big")
    return bool(lib.schnorr__verify_signature(
        _buf(message), len(message), _buf(pub), _buf(sig[0]), _buf(sig[1])))
