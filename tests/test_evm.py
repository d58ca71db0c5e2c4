"""The on-chain path as REAL BYTECODE: hand-assembled contracts running on
the EVM interpreter (zecale_tpu/evm/) with BW6-761 precompiles.

Mirrors the reference's live-contract test
/root/reference/client/test_commands/test_bw6_761_groth16_contract.py:43-106
(deploy Groth16BW6_761_test, accept testdata batch1.json, reject
batch1-invalid.json) without the ganache fork dependency.
"""

import json
import os

import pytest

from zecale_tpu.contracts.dispatcher import (
    inputs_to_contract_parameters,
    proof_to_contract_parameters,
    vk_to_contract_parameters,
)
from zecale_tpu.evm import contracts_asm, vm
from zecale_tpu.evm.keccak import keccak256
from zecale_tpu.serialization import json_codec as jc

TESTDATA = "/root/reference/testdata/dummy_app"


def _load_batch(name):
    with open(os.path.join(TESTDATA, name)) as f:
        batch = json.load(f)
    ep = jc.extended_proof_from_json("bw6-761", batch["ext_proof"])
    return ep


def _load_vk_words():
    with open(os.path.join(TESTDATA, "aggregator_vk.json")) as f:
        vk = jc.groth16_vk_from_json("bw6-761", json.load(f))
    return vk_to_contract_parameters(vk)


# ---------------------------------------------------------------------------
# interpreter basics
# ---------------------------------------------------------------------------


def test_vm_arith_and_return():
    from zecale_tpu.evm.asm import Asm

    a = Asm()
    # return 7 * 6 + 1
    a.emit(6, 7, "MUL", 1, "ADD", 0, "MSTORE", 0x20, 0, "RETURN")
    chain = vm.Chain()
    addr = chain.deploy(a.assemble())
    ret, gas = chain.call(addr, b"")
    assert int.from_bytes(ret, "big") == 43
    assert gas > 0


def test_vm_keccak_matches_reference_impl():
    from zecale_tpu.evm.asm import Asm

    a = Asm()
    # keccak256 of 32 bytes at memory 0 (value 0xdead)
    a.emit(0xDEAD, 0, "MSTORE", 0x20, 0, "KECCAK256", 0, "MSTORE",
           0x20, 0, "RETURN")
    chain = vm.Chain()
    addr = chain.deploy(a.assemble())
    ret, _ = chain.call(addr, b"")
    assert ret == keccak256((0xDEAD).to_bytes(32, "big"))


def test_vm_revert_rolls_back_storage():
    from zecale_tpu.evm.asm import Asm

    ok = Asm()
    ok.emit(42, 5, "SSTORE", "STOP")
    bad = Asm()
    bad.emit(99, 5, "SSTORE", 0, 0, "REVERT")
    chain = vm.Chain()
    a1 = chain.deploy(ok.assemble())
    a2 = chain.deploy(bad.assemble())
    chain.call(a1, b"")
    assert chain.account(a1).storage[5] == 42
    with pytest.raises(vm.EvmRevert):
        chain.call(a2, b"")
    assert 5 not in chain.account(a2).storage


# ---------------------------------------------------------------------------
# the Groth16 BW6-761 verifier as bytecode, on golden vectors
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def verifier_chain():
    chain = vm.Chain()
    addr = chain.deploy(contracts_asm.groth16_verifier_test_code())
    return chain, addr


def _call_verify(chain, addr, ep):
    cd = contracts_asm.encode_test_verify(
        _load_vk_words(),
        proof_to_contract_parameters(ep.proof),
        inputs_to_contract_parameters(ep.inputs),
    )
    ret, gas = chain.call(addr, cd)
    return int.from_bytes(ret, "big"), gas


def test_golden_batch1_accepted_by_bytecode(verifier_chain):
    chain, addr = verifier_chain
    result, gas = _call_verify(chain, addr, _load_batch("batch1.json"))
    assert result == 1
    assert gas > 100_000  # input accumulation + pairing were metered


def test_golden_batch1_invalid_rejected_by_bytecode(verifier_chain):
    chain, addr = verifier_chain
    result, _ = _call_verify(
        chain, addr, _load_batch("batch1-invalid.json")
    )
    assert result == 0


def test_wrong_input_count_reverts(verifier_chain):
    chain, addr = verifier_chain
    ep = _load_batch("batch1.json")
    cd = contracts_asm.encode_test_verify(
        _load_vk_words(),
        proof_to_contract_parameters(ep.proof),
        inputs_to_contract_parameters(ep.inputs)[:-2],
    )
    with pytest.raises(vm.EvmRevert):
        chain.call(addr, cd)


# ---------------------------------------------------------------------------
# full settlement path: dispatcher + dummy app as bytecode
# (mirrors scripts/test-client:26-97 settlement semantics)
# ---------------------------------------------------------------------------


def test_dispatcher_settlement_path():
    ep = _load_batch("batch1.json")
    vk_words = _load_vk_words()
    inputs_words = inputs_to_contract_parameters(ep.inputs)
    proof_words = proof_to_contract_parameters(ep.proof)

    chain = vm.Chain()
    disp = chain.deploy(contracts_asm.dispatcher_code())
    app = chain.deploy(contracts_asm.dummy_application_code())

    # init dispatcher with the aggregator vk (batch_size=2), app with the
    # dispatcher address + the nested vk hash from the batch inputs
    chain.call(disp, contracts_asm.encode_init_dispatcher(vk_words, 2))
    vk_hash = (inputs_words[0], inputs_words[1])
    chain.call(app, contracts_asm.encode_init_app(disp, vk_hash))

    params = [
        contracts_asm.encode_app_parameters(1111),
        contracts_asm.encode_app_parameters(2222),
    ]
    cd = contracts_asm.encode_process_batch(
        proof_words, inputs_words, params, app
    )
    ret, gas = chain.call(disp, cd)
    assert int.from_bytes(ret, "big") == 1
    assert gas > 100_000

    # results mask from the batch drives which scalars were recorded
    results = inputs_words[3]
    scalars = [inputs_words[5], inputs_words[7]]
    for i, s in enumerate(scalars):
        expect = [1111, 2222][i] if (results >> i) & 1 else 0
        got, _ = chain.call(app, contracts_asm.encode_get(s))
        assert int.from_bytes(got, "big") == expect, (i, s)

    # replay protection: processing the same batch again must revert
    # (scalar already seen)
    if results & 1:
        with pytest.raises(vm.EvmRevert):
            chain.call(disp, cd)


def test_dispatcher_rejects_invalid_batch():
    ep = _load_batch("batch1-invalid.json")
    vk_words = _load_vk_words()
    chain = vm.Chain()
    disp = chain.deploy(contracts_asm.dispatcher_code())
    app = chain.deploy(contracts_asm.dummy_application_code())
    chain.call(disp, contracts_asm.encode_init_dispatcher(vk_words, 2))
    inputs_words = inputs_to_contract_parameters(ep.inputs)
    chain.call(app, contracts_asm.encode_init_app(
        disp, (inputs_words[0], inputs_words[1])))
    cd = contracts_asm.encode_process_batch(
        proof_to_contract_parameters(ep.proof),
        inputs_words,
        [contracts_asm.encode_app_parameters(1)] * 2,
        app,
    )
    with pytest.raises(vm.EvmRevert):
        chain.call(disp, cd)


def test_app_rejects_untrusted_dispatcher():
    chain = vm.Chain()
    app = chain.deploy(contracts_asm.dummy_application_code())
    chain.call(app, contracts_asm.encode_init_app(0xD15B, (0, 0)))
    # a direct dispatch from a non-dispatcher address must revert
    cd = (
        contracts_asm.DISPATCH_SELECTOR.to_bytes(4, "big")
        + (0).to_bytes(32, "big") * 2
        + (0x80).to_bytes(32, "big")
        + (0xC0).to_bytes(32, "big")
        + (1).to_bytes(32, "big")
        + (7).to_bytes(32, "big")
        + (0x60).to_bytes(32, "big")
        + contracts_asm.encode_app_parameters(5)
    )
    with pytest.raises(vm.EvmRevert):
        chain.call(app, cd)
