"""In-circuit recursive verifier tests.

Fast tier: bigfield byte binding + the joint-ladder batch_mul at reduced
bit width, checked for constraint satisfaction (circuit_check) — no
proving.  Heavy tier (AZTEC_HEAVY=1): full in-circuit verification of an
unrolled-standard inner proof, with the recovered pairing accumulators
matched against the native verifier's (ref: verifier.hpp:190).
"""

import os
import secrets

import pytest

from aztec_tpu.curves.pairing import g1_mul, g1_add, g1_msm
from aztec_tpu.ff.bn254 import FR_MOD, FQ_MOD
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.stdlib.bigfield import BigField
from aztec_tpu.stdlib.biggroup import BigGroup
from aztec_tpu.stdlib.field_t import FieldT
from aztec_tpu.stdlib.recursion_verifier import (
    batch_mul,
    bit_decompose,
    fq_from_bytes,
    g1_from_proof_bytes,
    verify_proof_circuit,
    add_proof_outputs_as_public_inputs,
)


def _ctx():
    return TurboComposer()


def test_fq_from_bytes_binds_value():
    c = _ctx()
    v = 0x1234_DEADBEEF_CAFEBABE_0102030405060708_A5A5A5A5A5A5A5A5 % FQ_MOD
    be = v.to_bytes(32, "big")
    byte_fs = []
    for b in be:
        f = FieldT.from_witness(c, b)
        c.create_range_constraint(f.witness_index, 8)
        byte_fs.append(f)
    bf = fq_from_bytes(c, byte_fs)
    assert bf.get_value() == v
    assert not c.failed, c.err
    assert check_turbo(c) == []


def test_bit_decompose():
    c = _ctx()
    v = secrets.randbelow(FR_MOD)
    f = FieldT.from_witness(c, v)
    bits = bit_decompose(c, f, 254)
    assert sum(int(b.get_value()) << i for i, b in enumerate(bits)) == v
    assert check_turbo(c) == []


def test_batch_mul_small():
    c = _ctx()
    P1 = g1_mul(17, (1, 2))
    P2 = g1_mul(9999, (1, 2))
    s1, s2 = 0xABCD, 0x1234
    pts = [BigGroup.from_witness(c, P1), BigGroup.from_witness(c, P2)]
    scs = [FieldT.from_witness(c, s1), FieldT.from_witness(c, s2)]
    out = batch_mul(c, pts, scs, bits=16)
    expected = g1_msm([(s1, P1), (s2, P2)])
    assert out.get_value() == expected
    assert not c.failed, c.err
    assert check_turbo(c) == []


def _fake_vk(settings, n=16, num_pub=2, seed=5):
    """A VerificationKey with synthetic on-curve commitments — enough for
    VK-compression tests (no proving)."""
    from aztec_tpu.plonk.proving_key import VerificationKey
    from aztec_tpu.stdlib.recursion_verifier import RecursiveVK

    labels = [item.commitment_label
              for item in settings.polynomial_manifest
              if item.source != "witness"]
    comms = {lab: g1_mul(seed + i * 7 + 1, (1, 2))
             for i, lab in enumerate(labels)}
    return VerificationKey(
        n=n, num_public_inputs=num_pub, commitments=comms,
        domain_root=pow(5, (FR_MOD - 1) // n, FR_MOD),
        g2_x=((1, 2), (3, 4)), settings=settings,
        contains_recursive_proof=False,
        recursive_proof_public_input_indices=None,
    )


def test_recursive_vk_compress_and_set_membership():
    from aztec_tpu.plonk.manifests import UNROLLED_TURBO
    from aztec_tpu.stdlib.recursion_verifier import RecursiveVK

    vk_a = _fake_vk(UNROLLED_TURBO, seed=5)
    vk_b = _fake_vk(UNROLLED_TURBO, seed=900)

    c = _ctx()
    rk = RecursiveVK.from_witness(c, vk_a)
    compressed = rk.compress(c)
    assert compressed.get_value() == RecursiveVK.compress_native(vk_a)
    assert compressed.get_value() != RecursiveVK.compress_native(vk_b)
    rk.validate_key_is_in_set(c, [vk_b, vk_a])
    assert not c.failed, c.err
    assert check_turbo(c) == []


def test_recursive_vk_not_in_set_fails():
    from aztec_tpu.plonk.manifests import UNROLLED_TURBO
    from aztec_tpu.stdlib.recursion_verifier import RecursiveVK

    vk_a = _fake_vk(UNROLLED_TURBO, seed=5)
    vk_b = _fake_vk(UNROLLED_TURBO, seed=900)
    c = _ctx()
    rk = RecursiveVK.from_witness(c, vk_a)
    rk.validate_key_is_in_set(c, [vk_b])
    assert c.failed or check_turbo(c) != []


@pytest.mark.skipif(os.environ.get("AZTEC_HEAVY") != "1",
                    reason="~1M-gate outer circuit; set AZTEC_HEAVY=1")
def test_recursive_verifier_matches_native():
    from tests.test_plonk import _build_test_circuit

    inner = _build_test_circuit()
    proof = inner.create_unrolled_prover().construct_proof()
    nv = inner.create_unrolled_verifier()
    assert nv.verify_proof(proof)
    expected = nv.pairing_inputs(proof)
    assert expected is not None

    outer = _ctx()
    out = verify_proof_circuit(outer, proof, nv.key)
    assert not outer.failed, outer.err
    assert out.P0.get_value() == expected[0]
    assert out.P1.get_value() == expected[1]

    idxs = add_proof_outputs_as_public_inputs(outer, out)
    assert len(idxs) == 16
    assert check_turbo(outer) == []


@pytest.mark.skipif(os.environ.get("AZTEC_HEAVY") != "1",
                    reason="~2M-gate outer circuit; set AZTEC_HEAVY=1")
def test_recursive_verifier_turbo_matches_native():
    """Unrolled-TURBO inner proof re-verified in-circuit with a
    from_witness VK — the inner-rollup aggregation shape."""
    from tests.test_turbo import _build_turbo_circuit
    from aztec_tpu.stdlib.recursion_verifier import RecursiveVK

    inner = _build_turbo_circuit()
    proof = inner.create_unrolled_prover().construct_proof()
    nv = inner.create_unrolled_verifier()
    assert nv.verify_proof(proof)
    expected = nv.pairing_inputs(proof)
    assert expected is not None

    outer = _ctx()
    rk = RecursiveVK.from_witness(outer, nv.key)
    rk.validate_key_is_in_set(outer, [nv.key])
    out = verify_proof_circuit(outer, proof, rk)
    assert not outer.failed, outer.err
    assert out.P0.get_value() == expected[0]
    assert out.P1.get_value() == expected[1]
    assert len(out.public_inputs) == nv.key.num_public_inputs
    assert check_turbo(outer) == []


@pytest.mark.skipif(os.environ.get("AZTEC_HEAVY") != "1",
                    reason="~2M-gate outer circuit; set AZTEC_HEAVY=1")
def test_recursive_verifier_ultra_matches_native():
    """Unrolled-ULTRA (plookup) inner proof re-verified in-circuit —
    BASELINE config 5 'UltraPlonk + recursive aggregation'.  The in-circuit
    quotient reconstruction includes the lookup grand-product terms
    (_lookup_t_circuit)."""
    from aztec_tpu.plonk.composer import MulTriple, UltraComposer
    from aztec_tpu.plonk.lookup_tables import xor_table

    inner = UltraComposer()
    inner.add_lookup_table(xor_table(2, index=2))
    out_idx = inner.read_from_table(2, inner.add_variable(1),
                                    inner.add_variable(2))
    assert inner.get_variable(out_idx) == 3
    a = inner.add_variable(5)
    b = inner.add_variable(7)
    p = inner.add_variable(35)
    inner.create_mul_gate(MulTriple(a, b, p, 1, -1, 0))

    proof = inner.create_unrolled_prover().construct_proof()
    nv = inner.create_unrolled_verifier()
    assert nv.verify_proof(proof)
    expected = nv.pairing_inputs(proof)
    assert expected is not None

    outer = _ctx()
    out = verify_proof_circuit(outer, proof, nv.key)
    assert not outer.failed, outer.err
    assert out.P0.get_value() == expected[0]
    assert out.P1.get_value() == expected[1]
    assert check_turbo(outer) == []
