// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.8.0;

/// Groth16 verifier over BW6-761 for wrapping proofs.
///
/// Fresh implementation against the same word layouts as the framework's
/// settlement engine (zecale_tpu/contracts/dispatcher.py) and the
/// reference's documented encodings (Groth16BW6_761.sol:9-14,36-43):
///   Fr = 2 uint256 words, Fq = 3 words, G1 = G2 = 6 words;
///   vk  = [alpha, -beta, -delta, abc_0 .. abc_n]    (6 words each)
///   prf = [a, b, c]                                 (18 words)
///   inputs = n * 2 words (HO, LO per scalar)
///
/// Relies on the BW6-761 precompiles of the Clearmatics EVM fork:
///   0xc1 = G1 add, 0xc2 = G1 scalar mul, 0xc3 = pairing product.
/// Verification: e(a,b) * e(acc, -g2) * e(alpha, -beta) * e(c, -delta) == 1
/// with acc = abc_0 + sum_i input_i * abc_{i+1} (gamma == 1 convention).
library Groth16BW6_761 {
    uint256 internal constant FQ_WORDS = 3;
    uint256 internal constant POINT_WORDS = 6;
    uint256 internal constant PAIR_WORDS = 12; // one (G1, G2) pair

    // -G2 generator (negated y), matching the framework's
    // zecale_tpu/ff/params.py BW6_761_G2_GENERATOR.
    function minus_g2() internal pure returns (uint256[6] memory g) {
        g[0] = 0x0110133241d9b816c852a82e69d660f9d61053aac5a7115f4c06201013890f6d;
        g[1] = 0x26b41c5dab3da268734ec3f1f09feb58c5bbcae9ac70e7c7963317a300e1b6ba;
        g[2] = 0xce6948cb3cd208d700e96efbc2ad54b06410cf4fe1bf995ba830c194cd025f1c;
        g[3] = 0x010b24ef8422976b500dde2f20442c62926e48cfb30f2e6bd0dae7c82c87db2b;
        g[4] = 0x665e1f70d9ef437c6f053c47f28ae315219735114032ead7e8d6126b7443dc2e;
        g[5] = 0x59f7a6f5061ca930bd62cb74ae96a19254a538d3761539f9092c5e98d738c52a;
    }

    function num_inputs_from_vk_length(uint256 vk_words)
        internal
        pure
        returns (uint256)
    {
        return (vk_words - 3 * POINT_WORDS) / POINT_WORDS - 1;
    }

    /// Input accumulator: acc = abc_0 + sum input_i * abc_{i+1}, via the
    /// ecmul (0xc2) / ecadd (0xc1) precompiles.
    function _accumulate_inputs(
        uint256[] memory vk,
        uint256[] memory inputs
    ) private view returns (uint256[6] memory acc) {
        uint256 n = num_inputs_from_vk_length(vk.length);
        require(inputs.length == 2 * n, "bad inputs length");

        // acc = abc_0
        for (uint256 w = 0; w < POINT_WORDS; ++w) {
            acc[w] = vk[3 * POINT_WORDS + w];
        }
        uint256[8] memory mul_in; // point (6 words) || scalar (2 words)
        uint256[12] memory add_in;
        bool ok;
        for (uint256 i = 0; i < n; ++i) {
            for (uint256 w = 0; w < POINT_WORDS; ++w) {
                mul_in[w] = vk[(4 + i) * POINT_WORDS + w];
            }
            mul_in[6] = inputs[2 * i];
            mul_in[7] = inputs[2 * i + 1];
            uint256[6] memory term;
            assembly {
                ok := staticcall(gas(), 0xc2, mul_in, 0x100, term, 0xc0)
            }
            require(ok, "ecmul failed");
            for (uint256 w = 0; w < POINT_WORDS; ++w) {
                add_in[w] = acc[w];
                add_in[POINT_WORDS + w] = term[w];
            }
            assembly {
                ok := staticcall(gas(), 0xc1, add_in, 0x180, acc, 0xc0)
            }
            require(ok, "ecadd failed");
        }
    }

    function verify(
        uint256[] memory vk,
        uint256[18] memory proof,
        uint256[] memory inputs
    ) internal view returns (bool) {
        uint256[6] memory acc = _accumulate_inputs(vk, inputs);
        uint256[6] memory mg2 = minus_g2();

        // pairing input: 4 (G1, G2) pairs, 12 words each
        uint256[48] memory pairs;
        uint256 o = 0;
        // e(a, b)
        for (uint256 w = 0; w < POINT_WORDS; ++w) pairs[o + w] = proof[w];
        for (uint256 w = 0; w < POINT_WORDS; ++w) {
            pairs[o + POINT_WORDS + w] = proof[POINT_WORDS + w];
        }
        o += PAIR_WORDS;
        // e(acc, -g2)
        for (uint256 w = 0; w < POINT_WORDS; ++w) pairs[o + w] = acc[w];
        for (uint256 w = 0; w < POINT_WORDS; ++w) {
            pairs[o + POINT_WORDS + w] = mg2[w];
        }
        o += PAIR_WORDS;
        // e(alpha, -beta)
        for (uint256 w = 0; w < POINT_WORDS; ++w) pairs[o + w] = vk[w];
        for (uint256 w = 0; w < POINT_WORDS; ++w) {
            pairs[o + POINT_WORDS + w] = vk[POINT_WORDS + w];
        }
        o += PAIR_WORDS;
        // e(c, -delta)
        for (uint256 w = 0; w < POINT_WORDS; ++w) {
            pairs[o + w] = proof[2 * POINT_WORDS + w];
        }
        for (uint256 w = 0; w < POINT_WORDS; ++w) {
            pairs[o + POINT_WORDS + w] = vk[2 * POINT_WORDS + w];
        }

        uint256[1] memory out;
        bool ok;
        assembly {
            ok := staticcall(gas(), 0xc3, pairs, 0x600, out, 0x20)
        }
        require(ok, "pairing precompile failed");
        return out[0] == 1;
    }
}
