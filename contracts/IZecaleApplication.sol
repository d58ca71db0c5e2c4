// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.8.0;

/// Interface that client applications expose to the Zecale dispatcher.
/// (Fresh implementation of the reference interface semantics,
/// IZecaleApplication.sol:23-30: the dispatcher forwards, per valid nested
/// proof, the nested verification key hash, the nested public inputs and
/// the application-opaque parameter blob.)
interface IZecaleApplication {
    /// `vk_hash` is the 2-word (377-bit) MiMC hash of the nested
    /// verification key the proof was checked against; `inputs` are the LO
    /// words of the nested primary inputs; `parameters` is the opaque
    /// payload bound to the proof by the application.
    function dispatch(
        uint256[2] calldata vk_hash,
        uint256[] calldata inputs,
        bytes calldata parameters
    ) external payable;
}
