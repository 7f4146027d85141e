"""Wire-format roundtrips for rollup transactions (ref: rollup_tx.hpp,
root_rollup_tx.hpp serialization)."""

from aztec_tpu.rollup.rollup_circuit import RollupTx
from aztec_tpu.rollup.root_rollup_circuit import RootRollupTx
from aztec_tpu.rollup.serialize import (
    read_rollup_tx,
    read_root_rollup_tx,
    write_rollup_tx,
    write_root_rollup_tx,
)


def test_rollup_tx_roundtrip():
    tx = RollupTx(
        rollup_id=0, num_txs=1, data_start_index=2, txs=[b"proofbytes"],
        old_data_root=3, new_data_root=4, old_data_path=[(5, 6), (7, 8)],
        old_null_root=9, new_null_roots=[10, 11],
        old_null_paths=[[(1, 2)], [(3, 4)]],
        data_roots_root=12, data_roots_paths=[[(13, 14)]],
        data_roots_indicies=[1],
        new_data_path=[(15, 16), (17, 18)],
        new_null_paths=[[(19, 20)], [(21, 22)]],
    )
    assert read_rollup_tx(write_rollup_tx(tx), rollup_id=0) == tx


def test_root_rollup_tx_roundtrip():
    tx = RootRollupTx(
        num_inner_proofs=2, rollup_id=7, rollups=[b"r1", b"r2"],
        old_data_roots_root=1, new_data_roots_root=2,
        old_data_roots_path=[(3, 4), (5, 6)],
    )
    assert read_root_rollup_tx(write_root_rollup_tx(tx, [(9, 9)])) == tx
