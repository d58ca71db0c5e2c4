"""Zeth MixParameters bridge fidelity (round-4 VERDICT item 9).

Reference semantics: client/zeth_zecale/create_nested_tx.py:17-63 — a
Zeth MixParameters object becomes a nested transaction whose dispatch
`parameters` blob ABI-encodes (one-time-sig vk[4], sigma, ciphertexts[]).
The blob must survive the whole pipeline: nested-tx JSON codec ->
aggregator pool -> AggregatedTransaction nested_parameters -> on-chain
decode by the application."""

import json
import random

from zecale_tpu.client import zeth_bridge as zb


def _mix_params(rng):
    ep = {
        "proof": {"a": ["0x1", "0x2"], "b": [["0x3", "0x4"],
                  ["0x5", "0x6"]], "c": ["0x7", "0x8"]},
        "inputs": ["0x9"],
    }
    return zb.MixParameters(
        extended_proof=ep,
        signature_vk=[rng.getrandbits(256) for _ in range(4)],
        signature=rng.getrandbits(256),
        ciphertexts=[
            bytes(rng.getrandbits(8) for _ in range(n))
            for n in (49, 96, 1)
        ],
    )


def test_dispatch_blob_roundtrip():
    rng = random.Random(5)
    mp = _mix_params(rng)
    blob = zb.mix_parameters_to_dispatch_parameters(mp)
    # static head: 4 vk words + sigma + array offset
    assert len(blob) % 32 == 0
    assert int.from_bytes(blob[:32], "big") == mp.signature_vk[0]
    got = zb.dispatch_parameters_to_mix_parameters(
        blob, mp.extended_proof
    )
    assert got.signature_vk == mp.signature_vk
    assert got.signature == mp.signature
    assert got.ciphertexts == mp.ciphertexts


def test_mix_parameters_json_roundtrip():
    rng = random.Random(6)
    mp = _mix_params(rng)
    d = json.loads(json.dumps(mp.to_json_dict()))
    mp2 = zb.MixParameters.from_json_dict(d)
    assert mp2.signature_vk == mp.signature_vk
    assert mp2.ciphertexts == mp.ciphertexts


def test_create_zeth_nested_tx_through_pool():
    """The encoded blob rides the nested transaction unchanged through
    the aggregator pool and comes back in the aggregated transaction's
    per-tx parameters (reference GenerateAggregatedTransaction response,
    aggregator_server.cpp:326-336)."""
    from zecale_tpu.aggregator.pool import ApplicationPool, NestedTransaction

    rng = random.Random(7)
    mp = _mix_params(rng)
    tx = zb.create_zeth_nested_tx(mp, fee_in_wei=42, app_name="zeth")
    assert tx["app_name"] == "zeth"
    blob = bytes.fromhex(tx["parameters"])
    ntx = NestedTransaction(
        application_name=tx["app_name"],
        extended_proof=None,  # pool ordering only needs fee
        parameters=blob,
        fee_in_wei=tx["fee_in_wei"],
    )
    pool = ApplicationPool("zeth", vk=None, batch_size=1)
    pool.add_tx(ntx)
    batch = pool.get_next_batch()
    assert batch and batch[0].parameters == blob
    got = zb.dispatch_parameters_to_mix_parameters(
        blob, mp.extended_proof
    )
    assert got.ciphertexts == mp.ciphertexts
