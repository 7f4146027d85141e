"""MiMC composer/widget/hash tests (ref: mimc_composer.test.cpp,
stdlib/hash/mimc/mimc.test.cpp)."""

import pytest

from aztec_tpu.plonk.circuit_check import check_mimc, check_standard
from aztec_tpu.plonk.composer import MiMCComposer, StandardComposer
from aztec_tpu.stdlib.field_t import FieldT
from aztec_tpu.stdlib.mimc_circuit import (
    MIMC_ROUND_CONSTANTS,
    NUM_MIMC_ROUNDS,
    mimc7,
    mimc7_native,
    mimc_block_cipher_native,
)


def test_round_constants_chain():
    assert len(MIMC_ROUND_CONSTANTS) == NUM_MIMC_ROUNDS == 91
    assert len(set(MIMC_ROUND_CONSTANTS)) == 91  # all distinct
    # deterministic chain
    from aztec_tpu.stdlib.mimc_circuit import _round_constants

    assert _round_constants() == MIMC_ROUND_CONSTANTS


def test_native_cipher_properties():
    a = mimc_block_cipher_native(123, 456)
    assert a == mimc_block_cipher_native(123, 456)
    assert a != mimc_block_cipher_native(124, 456)
    h = mimc7_native([1, 2, 3])
    assert h != mimc7_native([1, 2, 4]) and h != mimc7_native([1, 2])


def test_mimc_gate_circuit_matches_native():
    c = MiMCComposer()
    c.create_dummy_gates()
    xs = [FieldT.from_witness(c, v) for v in (11, 22, 33)]
    out = mimc7(c, xs, use_mimc_gates=True)
    assert out.get_value() == mimc7_native([11, 22, 33])
    assert check_mimc(c) == []
    assert c.n > 3 * 91


def test_standard_lowering_matches_native():
    c = StandardComposer()
    xs = [FieldT.from_witness(c, v) for v in (7, 8)]
    out = mimc7(c, xs, use_mimc_gates=False)
    assert out.get_value() == mimc7_native([7, 8])
    assert check_standard(c) == []


def test_tampered_mimc_witness_fails_check():
    c = MiMCComposer()
    x = FieldT.from_witness(c, 5)
    out = mimc7(c, [x], use_mimc_gates=True)
    # corrupt one intermediate x_cubed witness
    c.variables[c.w_r[3]] = (c.variables[c.w_r[3]] + 1) % \
        __import__("aztec_tpu.ff.bn254", fromlist=["FR_MOD"]).FR_MOD
    assert check_mimc(c) != []


def test_mimc_prove_verify_roundtrip():
    c = MiMCComposer()
    c.create_dummy_gates()
    x = FieldT.from_witness(c, 41)
    out = mimc7(c, [x], use_mimc_gates=True)
    out.set_public()
    proof = c.create_prover().construct_proof()
    assert c.create_verifier().verify_proof(proof)
    # tamper -> reject
    bad = bytearray(proof)
    bad[100] ^= 1
    assert not c.create_verifier().verify_proof(bytes(bad))
