"""On-chain layer (ref: blockchain/contracts).

The reference's Solidity contracts — RollupProcessor.sol (escrow + state +
proof dispatch) and TurboVerifier.sol (on-chain PLONK verifier) — re-built
as executable Python components with the same semantics:

- rollup_processor.RollupProcessor: deposits/withdrawals, rollup state,
  decoder, escape-hatch windows; verification delegated to the native
  verifier (the TurboVerifier role).  Implements the sequencer's
  Blockchain protocol, closing the falafel -> RollupProcessor loop.
- sol_verifier.write_verifier_contract: emits a standalone StandardVerifier
  .sol source (plus the VK library from plonk/sol_gen.py) for on-EVM
  deployment; no Solidity toolchain exists in this image, so the emitted
  source is validated structurally, and its algebra mirrors
  plonk/verifier.py (which is cross-verified against the reference).
"""

from .rollup_processor import RollupProcessor, RollupProofData
