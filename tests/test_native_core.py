"""Native C++ composer core vs the Python composer (copy cycles, witness
assembly, selector layout must agree)."""

import ctypes

import numpy as np
import pytest

from aztec_tpu.ff.bn254 import FR_MOD


def _load():
    try:
        from aztec_tpu.native.build import load_composer_core

        return load_composer_core()
    except Exception as e:  # g++ missing etc.
        pytest.skip(f"native core unavailable: {e}")


def _u64x4(v):
    return (ctypes.c_uint64 * 4)(*[(v >> (64 * k)) & ((1 << 64) - 1) for k in range(4)])


def test_sigma_mappings_match_python_composer():
    lib = _load()
    from aztec_tpu.plonk.composer import StandardComposer, AddTriple, MulTriple

    # python composer
    pc = StandardComposer()
    a = pc.add_variable(3)
    b = pc.add_variable(4)
    c_ = pc.add_variable(12)
    pc.create_mul_gate(MulTriple(a, b, c_, 1, -1, 0))
    d = pc.add_variable(7)
    pc.create_add_gate(AddTriple(a, b, d, 1, 1, -1, 0))
    e = pc.add_variable(12)
    pc.assert_equal(c_, e)
    pub = pc.add_public_variable(99)

    # native core replays the same structure
    cc = lib.cc_new(5)
    idx = {}
    for i, v in enumerate(pc.variables):
        idx[i] = lib.cc_add_variable(cc, _u64x4(v))
    # zero-fix gate emitted by the python composer constructor:
    zeros = (ctypes.c_uint64 * 20)(*([0] * 20))
    wires_seq = list(zip(pc.w_l, pc.w_r, pc.w_o))
    for (wl, wr, wo) in wires_seq:
        wires = (ctypes.c_uint32 * 3)(wl, wr, wo)
        lib.cc_gate(cc, 3, wires, zeros)
    lib.cc_assert_equal(cc, c_, e)
    lib.cc_set_public(cc, pub)

    size = pc.subgroup_size()
    py_next, py_factor = pc.compute_sigma_mappings(size, 3)

    nr = np.zeros((3 * size,), np.int32)
    fa = np.zeros((3 * size,), np.uint8)
    lib.cc_sigma_mappings(
        cc, 3, size,
        nr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    nr = nr.reshape(3, size)
    fa = fa.reshape(3, size)
    for col in range(3):
        assert list(nr[col]) == list(py_next[col]), f"col {col} next_row"
        # python tags the external (public-input) coset as width (=4);
        # the native core uses 255 — normalize both to -1 before comparing.
        expect = [-1 if x == 4 else x for x in py_factor[col]]
        got = [-1 if x == 255 else x for x in fa[col]]
        assert got == expect, f"col {col} factor"

    # witness export agrees
    out = np.zeros((size * 4,), np.uint64)
    lib.cc_export_witness(
        cc, 0, size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    )
    w1_vals = [
        int(out[4 * i]) | int(out[4 * i + 1]) << 64
        | int(out[4 * i + 2]) << 128 | int(out[4 * i + 3]) << 192
        for i in range(size)
    ]
    pubvals = [pc.get_variable(p) for p in pc.public_inputs]
    expected = pubvals + [pc.get_variable(w) for w in pc.w_l]
    expected += [0] * (size - len(expected))
    assert w1_vals == [v % FR_MOD for v in expected]
    lib.cc_free(cc)
