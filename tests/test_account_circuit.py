"""account circuit tests (ref: rollup/proofs/account/account.test.cpp)."""

from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.merkle import MemoryTree
from aztec_tpu.rollup import notes_native as nn
from aztec_tpu.rollup.account import AccountTx, account_circuit, sign_tx
from aztec_tpu.crypto import pedersen as pd

ACCOUNT_PRIV = 0x0B0B + 7
ACCOUNT_PUB = pd.fixed_base_scalar_mul_g1(ACCOUNT_PRIV, 254)
SPEND1 = pd.fixed_base_scalar_mul_g1(0x51, 254)
SPEND2 = pd.fixed_base_scalar_mul_g1(0x52, 254)


def _tx(nonce=0, migrate=True, tree=None, account_index=0):
    tree = tree or MemoryTree(3)
    tx = AccountTx(
        merkle_root=tree.root,
        account_public_key=ACCOUNT_PUB,
        new_account_public_key=ACCOUNT_PUB,
        new_signing_pub_key_1=SPEND1,
        new_signing_pub_key_2=SPEND2,
        alias_hash=0xA11A5,
        nonce=nonce,
        migrate=migrate,
        gibberish=0x61BB,
        account_index=account_index,
        account_path=tree.get_hash_path(account_index),
        signing_pub_key=SPEND1,
        signature=(bytes(32), bytes(32)),
    )
    return tree, tx


def test_account_register_nonce0():
    _, tx = _tx(nonce=0, migrate=True)
    tx.signature = sign_tx(tx, ACCOUNT_PRIV, k=0xFEED)  # account key signs
    c = TurboComposer()
    account_circuit(c, tx)
    assert not c.failed, c.err
    assert check_turbo(c) == []
    assert len(c.public_inputs) == 14


def test_account_nonce1_requires_registered_signer():
    # insert the account note binding (alias, nonce=1) -> (account key,
    # SPEND1), then a nonce-1 tx signed by SPEND1 must verify
    tree = MemoryTree(3)
    aid = nn.account_alias_id(0xA11A5, 1)
    note = nn.encrypt_account_note(aid, ACCOUNT_PUB, SPEND1)
    tree.update_element(0, nn.leaf_bytes(note))

    tree, tx = _tx(nonce=1, migrate=False, tree=tree, account_index=0)
    tx.signature = sign_tx(tx, 0x51, k=0xFEED)  # spending key signs
    c = TurboComposer()
    account_circuit(c, tx)
    assert not c.failed, c.err
    assert check_turbo(c) == []


def test_account_nonce0_migrate_required():
    _, tx = _tx(nonce=0, migrate=False)
    tx.signature = sign_tx(tx, ACCOUNT_PRIV, k=0xFEED)
    c = TurboComposer()
    account_circuit(c, tx)
    assert c.failed or check_turbo(c) != []


def test_account_bad_signature_fails():
    _, tx = _tx(nonce=0, migrate=True)
    tx.signature = sign_tx(tx, 0x51, k=0xFEED)  # wrong key for nonce 0
    c = TurboComposer()
    account_circuit(c, tx)
    assert c.failed or check_turbo(c) != []
