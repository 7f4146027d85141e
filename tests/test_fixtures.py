"""Fixture cache (utils/fixtures.py): compute-or-load contract + VK JSON
roundtrip (ref: root_rollup/compute_or_load_fixture.hpp:18-40)."""

import os

import pytest

from aztec_tpu.utils import fixtures


def test_compute_or_load_bytes(tmp_path, monkeypatch):
    monkeypatch.setattr(fixtures, "_DIR", str(tmp_path))
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        return b"artifact-bytes"

    assert fixtures.compute_or_load("t1", fn) == b"artifact-bytes"
    assert fixtures.compute_or_load("t1", fn) == b"artifact-bytes"
    assert calls["n"] == 1  # second call loaded from disk

    # version bump recomputes
    assert fixtures.compute_or_load("t1", fn, version="2") == b"artifact-bytes"
    assert calls["n"] == 2

    # AZTEC_NO_FIXTURES forces recompute
    monkeypatch.setenv("AZTEC_NO_FIXTURES", "1")
    fixtures.compute_or_load("t1", fn)
    assert calls["n"] == 3


def test_compute_or_load_pickle(tmp_path, monkeypatch):
    monkeypatch.setattr(fixtures, "_DIR", str(tmp_path))
    obj = {"a": [1, 2, 3], "b": (4, 5)}
    got = fixtures.compute_or_load_pickle("t2", lambda: obj)
    got2 = fixtures.compute_or_load_pickle("t2", lambda: {"other": 1})
    assert got == obj and got2 == obj


def test_vk_json_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(fixtures, "_DIR", str(tmp_path))
    from aztec_tpu.plonk.proving_key import VerificationKey
    from aztec_tpu.plonk.manifests import UNROLLED_STANDARD
    from aztec_tpu.curves.tower import G2_GEN

    vk = VerificationKey(
        n=16,
        num_public_inputs=2,
        commitments={"Q_1": (123, 456), "Q_M": None},
        domain_root=0xABCDEF,
        g2_x=G2_GEN,
        settings=UNROLLED_STANDARD,
        contains_recursive_proof=True,
        recursive_proof_public_input_indices=tuple(range(16)),
    )
    vk2 = fixtures.vk_from_json(fixtures.vk_to_json(vk))
    assert vk2.n == vk.n
    assert vk2.num_public_inputs == vk.num_public_inputs
    assert vk2.commitments == vk.commitments
    assert vk2.domain_root == vk.domain_root
    assert vk2.g2_x == vk.g2_x
    assert vk2.settings is UNROLLED_STANDARD
    assert vk2.contains_recursive_proof
    assert vk2.recursive_proof_public_input_indices == tuple(range(16))


def test_proof_and_vk_fixture(tmp_path, monkeypatch):
    monkeypatch.setattr(fixtures, "_DIR", str(tmp_path))
    from aztec_tpu.plonk.proving_key import VerificationKey
    from aztec_tpu.plonk.manifests import STANDARD
    from aztec_tpu.curves.tower import G2_GEN

    vk = VerificationKey(
        n=4, num_public_inputs=0, commitments={"Q_1": (7, 8)},
        domain_root=3, g2_x=G2_GEN, settings=STANDARD,
    )
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        return b"\x01\x02proof", vk

    p1, v1 = fixtures.compute_or_load_proof_and_vk("t3", fn)
    p2, v2 = fixtures.compute_or_load_proof_and_vk("t3", fn)
    assert calls["n"] == 1
    assert p1 == p2 == b"\x01\x02proof"
    assert v2.commitments == vk.commitments
