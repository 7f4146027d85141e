"""Rollup aggregation end-to-end (ref: rollup/proofs/rollup/rollup.test.cpp,
root_rollup/root_rollup.test.cpp).

AZTEC_HEAVY=1 tier: a real unrolled-turbo join_split proof (fixture-cached)
is aggregated by the inner rollup circuit — witness generation, full
constraint check, and a REAL pairing check on the deferred accumulators
(equivalent to the outer proof's final pairing, without the outer prove).
The root rollup consumes the rollup's public-input layout the same way.
"""

import os

import pytest

heavy = pytest.mark.skipif(os.environ.get("AZTEC_HEAVY") != "1",
                           reason="multi-minute witness gen; AZTEC_HEAVY=1")

ACCOUNT_PRIV = 0x0B0B + 7


def _make_world_and_tx():
    from aztec_tpu.crypto import pedersen as pd
    from aztec_tpu.rollup import notes_native as nn
    from aztec_tpu.rollup.join_split import JoinSplitTx, sign_tx
    from aztec_tpu.rollup.world_state import WorldState

    pub = pd.fixed_base_scalar_mul_g1(ACCOUNT_PRIV, 254)
    ws = WorldState(data_depth=6, null_depth=16, root_depth=4)
    in1 = nn.ValueNote(100, 1, 0, pub, 0xAAAA1)
    in2 = nn.ValueNote(50, 1, 0, pub, 0xAAAA2)
    out1 = nn.ValueNote(70, 1, 0, pub, 0xBBBB1)
    out2 = nn.ValueNote(40, 1, 0, pub, 0xBBBB2)
    ws.insert_note(0, nn.encrypt_note(in1))
    ws.insert_note(1, nn.encrypt_note(in2))
    # record the current data root as a historic root (rollup 0)
    ws.insert_data_root(0, ws.data_root())

    tx = JoinSplitTx(
        public_input=0, public_output=30, asset_id=1, num_input_notes=2,
        input_index=(0, 1), input_note=(in1, in2),
        output_note=(out1, out2), signing_pub_key=pub,
        signature=(bytes(32), bytes(32)),
        old_data_root=ws.data_root(),
        input_path=(ws.data_tree.get_hash_path(0),
                    ws.data_tree.get_hash_path(1)),
        account_index=2, account_path=ws.data_tree.get_hash_path(2),
        input_owner=0xAA, output_owner=0xBB,
        account_private_key=ACCOUNT_PRIV, alias_hash=0, nonce=0,
    )
    tx.signature = sign_tx(tx, ACCOUNT_PRIV, k=0x777)
    return ws, tx


def _join_split_proof_fixture():
    from aztec_tpu.utils.fixtures import compute_or_load_proof_and_vk

    ws, tx = _make_world_and_tx()

    def build():
        from aztec_tpu.plonk.composer import TurboComposer
        from aztec_tpu.srs.reference_string import FakeReferenceStringFactory

        c = TurboComposer(crs_factory=FakeReferenceStringFactory())
        from aztec_tpu.rollup.join_split import join_split_circuit

        join_split_circuit(c, tx)
        assert not c.failed, c.err
        proof = c.create_unrolled_prover().construct_proof()
        vk = c.compute_verification_key()
        # unrolled settings for the recursion path
        from aztec_tpu.plonk import manifests
        import dataclasses as dc

        vk = dc.replace(vk, settings=manifests.UNROLLED_TURBO)
        return proof, vk

    proof, vk = compute_or_load_proof_and_vk("rollup_e2e_join_split", build,
                                             version="1")
    return ws, proof, vk


@heavy
def test_rollup_aggregates_join_split():
    from aztec_tpu.curves import pairing as pr
    from aztec_tpu.curves.tower import G2_GEN
    from aztec_tpu.plonk.circuit_check import check_turbo
    from aztec_tpu.plonk.composer import TurboComposer
    from aztec_tpu.plonk.verifier import Verifier
    from aztec_tpu.rollup.create_rollup import create_rollup_tx
    from aztec_tpu.rollup.rollup_circuit import rollup_circuit
    from aztec_tpu.srs.reference_string import FakeReferenceStringFactory

    ws, js_proof, js_vk = _join_split_proof_fixture()

    # native sanity: the inner proof verifies
    from aztec_tpu.plonk.flavors import UnrolledTurboFlavor

    assert Verifier(js_vk, UnrolledTurboFlavor).verify_proof(js_proof)

    rtx = create_rollup_tx(ws, rollup_id=1, tx_proofs=[js_proof])
    outer = TurboComposer(crs_factory=FakeReferenceStringFactory())
    out = rollup_circuit(outer, rtx, [js_vk], rollup_size=1)
    assert not outer.failed, outer.err
    assert outer.recursive_proof_public_input_indices is not None

    # the deferred accumulator passes the real pairing (what the outer
    # proof's verifier would check after folding)
    P0 = out.P0.get_value()
    P1 = out.P1.get_value()
    assert pr.pairing_check([(P0, G2_GEN), (P1, js_vk.g2_x)])

    assert check_turbo(outer) == []

    # public-input layout: 9 + NUM_ASSETS + 1 + 12*size + 16 limbs
    assert len(outer.public_inputs) == 9 + 4 + 1 + 12 + 16


@heavy
def test_rollup_rejects_tampered_inner_proof():
    from aztec_tpu.plonk.circuit_check import check_turbo
    from aztec_tpu.plonk.composer import TurboComposer
    from aztec_tpu.rollup.create_rollup import create_rollup_tx
    from aztec_tpu.rollup.rollup_circuit import rollup_circuit
    from aztec_tpu.curves import pairing as pr
    from aztec_tpu.curves.tower import G2_GEN

    ws, js_proof, js_vk = _join_split_proof_fixture()
    bad = bytearray(js_proof)
    bad[14 * 32 + 5] ^= 1  # tamper past the public inputs
    rtx = create_rollup_tx(ws, rollup_id=1, tx_proofs=[bytes(bad)])
    outer = TurboComposer()
    try:
        out = rollup_circuit(outer, rtx, [js_vk], rollup_size=1)
    except Exception:
        return  # witness generation may fail outright — acceptable reject
    bad_pairing = not pr.pairing_check(
        [(out.P0.get_value(), G2_GEN), (out.P1.get_value(), js_vk.g2_x)])
    assert outer.failed or check_turbo(outer) != [] or bad_pairing
