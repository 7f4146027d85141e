"""Rollup application circuits (ref: rollup/proofs/).

The product layer of the stack: private value-note transfers (join_split),
account registration (account), direct exits (escape_hatch), and the
recursive aggregation circuits (rollup, root_rollup) that batch them for
on-chain verification.
"""
