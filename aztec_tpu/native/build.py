"""Build + ctypes-load the native components (cached .so)."""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src")
_LIB = os.path.join(_DIR, "libcomposer_core.so")

_core = None


def _build():
    src = os.path.join(_SRC, "composer_core.cpp")
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= max(
        os.path.getmtime(src), os.path.getmtime(os.path.join(_SRC, "fr.hpp"))
    ):
        return
    subprocess.check_call(
        [
            "g++", "-O3", "-std=c++17", "-fPIC", "-shared",
            "-o", _LIB, src,
        ]
    )


def load_composer_core() -> ctypes.CDLL:
    global _core
    if _core is not None:
        return _core
    _build()
    lib = ctypes.CDLL(_LIB)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.cc_new.restype = ctypes.c_void_p
    lib.cc_new.argtypes = [ctypes.c_uint32]
    lib.cc_free.argtypes = [ctypes.c_void_p]
    lib.cc_add_variable.restype = ctypes.c_uint32
    lib.cc_add_variable.argtypes = [ctypes.c_void_p, u64p]
    lib.cc_get_variable.argtypes = [ctypes.c_void_p, ctypes.c_uint32, u64p]
    lib.cc_set_public.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.cc_assert_equal.restype = ctypes.c_int
    lib.cc_assert_equal.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32]
    lib.cc_failed.restype = ctypes.c_int
    lib.cc_failed.argtypes = [ctypes.c_void_p]
    lib.cc_gate.argtypes = [ctypes.c_void_p, ctypes.c_uint32, u32p, u64p]
    lib.cc_num_gates.restype = ctypes.c_uint64
    lib.cc_num_gates.argtypes = [ctypes.c_void_p]
    lib.cc_num_public.restype = ctypes.c_uint64
    lib.cc_num_public.argtypes = [ctypes.c_void_p]
    lib.cc_num_vars.restype = ctypes.c_uint64
    lib.cc_num_vars.argtypes = [ctypes.c_void_p]
    lib.cc_export_selector.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint64, u64p,
    ]
    lib.cc_export_witness.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint64, u64p,
    ]
    lib.cc_sigma_mappings.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint64, i32p, u8p,
    ]
    _core = lib
    return lib
