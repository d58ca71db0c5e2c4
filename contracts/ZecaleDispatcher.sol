// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.8.0;

import "./Groth16BW6_761.sol";
import "./IZecaleApplication.sol";

/// Settlement entry point: verifies one wrapping proof and forwards each
/// valid nested transaction to its application contract.
///
/// Fresh implementation of the reference dispatcher's semantics
/// (ZecaleDispatcher.sol:79-169) with the batch size a constructor
/// parameter instead of a hard-coded constant.  The primary-input layout is
/// the aggregator circuit's contract:
///   [ vk_hash (2 words), results (2 words),
///     nested_inputs[0] .. nested_inputs[batch-1] (2 words each scalar) ]
/// results bit i (LO first) is the validity of nested proof i.
contract ZecaleDispatcher {
    uint256 public immutable batch_size;
    uint256 internal constant SCALAR_WORDS = 2;

    uint256[] internal _vk;
    uint256 public total_inputs;
    uint256 public inputs_per_nested_tx;

    event log(string a, uint256 v);

    constructor(uint256[] memory vk, uint256 batch_size_) {
        _vk = vk;
        batch_size = batch_size_;
        total_inputs = Groth16BW6_761.num_inputs_from_vk_length(vk.length);
        // minus vk_hash and results
        inputs_per_nested_tx = (total_inputs - 2) / batch_size_;
    }

    /// `batch_proof`: 18-word wrapping proof; `inputs`: the wrapper primary
    /// inputs as 2-word scalars; `nested_parameters[i]`: opaque payload for
    /// nested tx i; `app`: target application.
    function process_batch(
        uint256[18] memory batch_proof,
        uint256[] memory inputs,
        bytes[] memory nested_parameters,
        IZecaleApplication app
    ) external payable returns (bool) {
        require(
            inputs.length == SCALAR_WORDS * total_inputs,
            "bad inputs length"
        );
        require(
            nested_parameters.length == batch_size,
            "bad parameters length"
        );

        if (!Groth16BW6_761.verify(_vk, batch_proof, inputs)) {
            emit log("invalid batch proof", 0);
            return false;
        }

        uint256[2] memory vk_hash = [inputs[0], inputs[1]];
        uint256 results = inputs[3]; // LO word of the results scalar

        uint256 off = 2 * SCALAR_WORDS;
        for (uint256 i = 0; i < batch_size; ++i) {
            uint256[] memory nested_inputs = new uint256[](
                inputs_per_nested_tx
            );
            for (uint256 j = 0; j < inputs_per_nested_tx; ++j) {
                // forward the LO word of each nested scalar
                nested_inputs[j] = inputs[off + 1];
                off += SCALAR_WORDS;
            }
            if ((results >> i) & 1 == 0) {
                emit log("skipping invalid proof", i);
                continue;
            }
            app.dispatch(vk_hash, nested_inputs, nested_parameters[i]);
        }
        return true;
    }
}
