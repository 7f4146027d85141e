#!/usr/bin/env bash
# Build the reference-verifier cross-check binary (tools/ref_cross_verify.cpp)
# directly against the read-only reference sources.  Produces
# build/ref_cross_verify, which rebuilds the matched test circuit with the
# REFERENCE StandardComposer and verifies a proof read from stdin.
#
# Usage: tools/build_ref_cross_verify.sh
# Then:  build/ref_cross_verify <srs_dir> <extra_gates> <pub_hex> < proof.bin
set -euo pipefail
REF=/root/reference/barretenberg/src/aztec
mkdir -p /root/repo/build
g++ -O1 -std=c++20 -fopenmp -w -I$REF -I/root/reference/barretenberg/src \
  /root/repo/tools/ref_cross_verify.cpp \
  $REF/env/logstr.cpp \
  $REF/plonk/composer/standard/compute_verification_key.cpp \
  $REF/crypto/blake2s/blake2s.cpp $REF/crypto/keccak/keccak.cpp $REF/crypto/keccak/keccakf1600.cpp \
  $REF/crypto/pedersen/pedersen.cpp \
  $REF/ecc/curves/bn254/scalar_multiplication/pippenger.cpp \
  $REF/ecc/curves/bn254/scalar_multiplication/process_buckets.cpp \
  $REF/ecc/curves/bn254/scalar_multiplication/runtime_states.cpp \
  $REF/ecc/curves/bn254/scalar_multiplication/scalar_multiplication.cpp \
  $REF/numeric/random/engine.cpp \
  $REF/plonk/composer/composer_base.cpp $REF/plonk/composer/standard_composer.cpp \
  $REF/plonk/proof_system/commitment_scheme/kate_commitment_scheme.cpp \
  $REF/plonk/proof_system/prover/prover.cpp $REF/plonk/proof_system/proving_key/proving_key.cpp \
  $REF/plonk/proof_system/verification_key/verification_key.cpp \
  $REF/plonk/proof_system/verifier/verifier.cpp \
  $REF/plonk/reference_string/file_reference_string.cpp \
  $REF/plonk/transcript/transcript.cpp $REF/plonk/transcript/transcript_wrappers.cpp \
  $REF/polynomials/evaluation_domain.cpp $REF/polynomials/polynomial.cpp \
  $REF/polynomials/polynomial_arithmetic.cpp \
  $REF/srs/io.cpp \
  -o /root/repo/build/ref_cross_verify
echo "built build/ref_cross_verify"
