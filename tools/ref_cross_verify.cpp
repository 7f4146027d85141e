// Cross-verification harness: verify an aztec_tpu proof with the REFERENCE
// barretenberg verifier (compiled directly from /root/reference sources).
//
// Usage: ref_cross_verify <srs_dir> <num_extra_gates> <pub_value_hex> < proof.bin
//
// Builds the same circuit as tests/test_plonk.py::_build_test_circuit with
// the reference StandardComposer, loads the SRS from <srs_dir>
// (Ignition-format transcript00.dat written by aztec_tpu.srs.io), reads the
// proof bytes on stdin, and runs the reference verifier.  Exit 0 iff the
// proof verifies.  Also prints the verification key commitments so the
// Python side can compare its own VK byte-for-byte.

#include <cstdio>
#include <iostream>
#include <vector>

#include <plonk/composer/standard_composer.hpp>
#include <plonk/proof_system/types/plonk_proof.hpp>
#include <plonk/reference_string/file_reference_string.hpp>

using namespace waffle;
using namespace barretenberg;

int main(int argc, char** argv)
{
    if (argc < 4) {
        std::cerr << "usage: ref_cross_verify <srs_dir> <extra_gates> <pub_hex>\n";
        return 2;
    }
    std::string srs_dir = argv[1];
    size_t extra = static_cast<size_t>(atoi(argv[2]));
    uint256_t pub_value(0);
    {
        // parse hex public input
        std::string h = argv[3];
        for (char c : h) {
            uint64_t d = (c >= '0' && c <= '9') ? uint64_t(c - '0')
                        : (c >= 'a' && c <= 'f') ? uint64_t(c - 'a' + 10)
                                                  : uint64_t(c - 'A' + 10);
            pub_value = (pub_value << uint256_t(4)) + uint256_t(d);
        }
    }

    StandardComposer composer(srs_dir);

    // mirror tests/test_plonk.py::_build_test_circuit
    composer.create_dummy_gates();
    uint32_t pub = composer.add_public_variable(fr(pub_value));
    (void)pub;
    uint32_t a = composer.add_variable(fr(3));
    uint32_t b = composer.add_variable(fr(4));
    uint32_t prod = composer.add_variable(fr(12));
    composer.create_mul_gate({ a, b, prod, fr::one(), fr::neg_one(), fr::zero() });
    fr acc_val = fr(12);
    uint32_t acc = prod;
    for (size_t i = 0; i < extra; ++i) {
        acc_val = acc_val + fr(3);
        uint32_t nxt = composer.add_variable(acc_val);
        composer.create_add_gate({ acc, a, nxt, fr::one(), fr::one(), fr::neg_one(), fr::zero() });
        acc = nxt;
    }

    auto verifier = composer.create_verifier();

    // print the reference's VK commitments for byte comparison
    auto vk = composer.compute_verification_key();
    for (const auto& [label, point] : vk->constraint_selectors) {
        std::cout << "VK " << label << " " << point.x << " " << point.y << "\n";
    }
    for (const auto& [label, point] : vk->permutation_selectors) {
        std::cout << "VK " << label << " " << point.x << " " << point.y << "\n";
    }

    // read proof from stdin
    std::vector<uint8_t> proof_bytes;
    {
        int c;
        while ((c = std::getchar()) != EOF) {
            proof_bytes.push_back(static_cast<uint8_t>(c));
        }
    }
    plonk_proof proof{ proof_bytes };
    bool ok = verifier.verify_proof(proof);
    std::cout << "VERIFIED " << (ok ? 1 : 0) << std::endl;
    return ok ? 0 : 1;
}
