"""aztec_tpu — a TPU-native PLONK proving stack (JAX/XLA/Pallas/pjit).

A from-scratch re-design of the capabilities of barretenberg (the C++ compute
core of AztecProtocol/aztec-2.0) for TPU hardware:

- ``aztec_tpu.numeric``    — host-side multiprecision helpers (ref: numeric/)
- ``aztec_tpu.ff``         — vectorized finite-field limb kernels (ref: ecc/fields/)
- ``aztec_tpu.curves``     — BN254 / Grumpkin group ops (ref: ecc/curves/, ecc/groups/)
- ``aztec_tpu.msm``        — Pippenger multi-scalar multiplication
                             (ref: ecc/curves/bn254/scalar_multiplication/)
- ``aztec_tpu.poly``       — evaluation domains, FFT, polynomial arithmetic
                             (ref: polynomials/)
- ``aztec_tpu.srs``        — structured reference strings (ref: plonk/reference_string/, srs/)
- ``aztec_tpu.crypto``     — keccak256 / blake2s / pedersen (ref: crypto/)
- ``aztec_tpu.transcript`` — manifest-driven Fiat-Shamir (ref: plonk/transcript/)
- ``aztec_tpu.plonk``      — proving/verification keys, widgets, provers,
                             verifiers, composers (ref: plonk/)
- ``aztec_tpu.parallel``   — mesh sharding for MSM/FFT over ICI/DCN (new; the
                             reference is single-process OpenMP only)

Field elements live on device as uint32 "limb planes": an array of shape
``(L, *batch)`` where ``L = 16`` little-endian 16-bit digits.  All hot paths
are batched vector kernels; sequential recurrences of the reference become
``lax.associative_scan``/``lax.scan``.
"""

__version__ = "0.1.0"


def standard_composer(*args, **kwargs):
    """Convenience constructor (lazy import keeps `import aztec_tpu` light)."""
    from .plonk.composer import StandardComposer

    return StandardComposer(*args, **kwargs)


def turbo_composer(*args, **kwargs):
    from .plonk.composer import TurboComposer

    return TurboComposer(*args, **kwargs)
