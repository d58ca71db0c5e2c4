// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.8.0;

import "./IZecaleApplication.sol";

/// Demo application: accepts dispatched nested transactions proving
/// knowledge of a scalar's multiplicative inverse, and records
/// scalar -> parameters.  Fresh implementation of the reference's
/// DummyApplication checks (permitted dispatcher, expected vk hash,
/// replay protection; DummyApplication.sol:35-61).
contract DummyApplication is IZecaleApplication {
    address public immutable permitted_dispatcher;
    uint256[2] public expected_vk_hash;

    mapping(uint256 => bytes) internal _scalars;
    mapping(uint256 => bool) internal _seen;

    constructor(address dispatcher, uint256[2] memory vk_hash) {
        permitted_dispatcher = dispatcher;
        expected_vk_hash = vk_hash;
    }

    function dispatch(
        uint256[2] calldata vk_hash,
        uint256[] calldata inputs,
        bytes calldata parameters
    ) external payable override {
        require(msg.sender == permitted_dispatcher, "wrong dispatcher");
        require(
            vk_hash[0] == expected_vk_hash[0] &&
                vk_hash[1] == expected_vk_hash[1],
            "wrong vk hash"
        );
        uint256 scalar = inputs[0];
        require(!_seen[scalar], "scalar already seen");
        _seen[scalar] = true;
        _scalars[scalar] = parameters;
    }

    function get(uint256 scalar)
        external
        view
        returns (bool exists, bytes memory parameters)
    {
        return (_seen[scalar], _scalars[scalar]);
    }
}
