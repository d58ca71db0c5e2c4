"""Service-level tests: pool semantics, RPC behaviors, live gRPC round trip.

Mirrors the reference test strategy: pool tests with a fake proof provider
(application_pool_test.cpp:18-77), duplicate-registration rejection and
whole-batch-only semantics (scripts/test-client:26-97), driven both directly
and over a real gRPC socket.
"""

import random

import pytest

from zecale_tpu.aggregator import dummy_app as da
from zecale_tpu.aggregator.pool import ApplicationPool, NestedTransaction
from zecale_tpu.api.service import AggregatorService, ServiceError
from zecale_tpu.serialization import json_codec as jc
from zecale_tpu.snark.groth16 import ExtendedProof, Groth16Proof


# ---------------------------------------------------------------------------
# fakes (reference analog: dummy_provider, application_pool_test.cpp:18-77)
# ---------------------------------------------------------------------------


class FakeCircuit:
    """Same interface as AggregatorCircuit; 'proves' by concatenation."""

    num_proofs = 2
    num_inputs = 1

    def compute_nested_vk_hash(self, vk):
        return sum(p[0] for p in vk.abc) % 997  # arbitrary deterministic

    def prove(self, vk, nested_proofs, wpk, prover=None):
        # a degenerate wrapping "proof" embedding the inputs
        inputs = [self.compute_nested_vk_hash(vk), (1 << self.num_proofs) - 1]
        for ep in nested_proofs:
            inputs.extend(ep.inputs)
        return ExtendedProof(proof=nested_proofs[0].proof, inputs=inputs)


class FakeKeypair:
    pk = "fake-pk"

    class vk:  # noqa: N801 - mimic attribute access
        pass


def _fake_service():
    rng = random.Random(1)
    _, nkp = da.dummy_app_setup("bls12-377", rng)
    svc = AggregatorService.__new__(AggregatorService)
    svc.circuit = FakeCircuit()
    svc.keypair = FakeKeypair()
    svc.nested_curve = "bls12-377"
    svc.wrapper_curve = "bw6-761"
    svc.prover = None
    svc.pools = {}
    return svc, nkp, rng


def _tx_json(nkp, a, fee, rng):
    ep = da.dummy_app_prove("bls12-377", nkp, a, rng)
    return {
        "app_name": "app",
        "extended_proof": jc.extended_proof_to_json("bls12-377", ep),
        "parameters": "aabb",
        "fee_in_wei": fee,
    }


# ---------------------------------------------------------------------------
# pool semantics
# ---------------------------------------------------------------------------


def test_pool_fee_priority_and_whole_batches():
    pool = ApplicationPool("app", vk=None, batch_size=2)
    for fee, tag in [(5, "a"), (9, "b"), (1, "c")]:
        pool.add_tx(
            NestedTransaction("app", extended_proof=tag, fee_in_wei=fee)
        )
    batch = pool.get_next_batch()
    assert [tx.extended_proof for tx in batch] == ["b", "a"]  # fee order
    # one tx left < batch_size -> no batch (reference tcc:48-63)
    assert pool.get_next_batch() is None
    assert pool.size == 1


# ---------------------------------------------------------------------------
# service behaviors
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_service_register_submit_aggregate_flow():
    svc, nkp, rng = _fake_service()
    vk_json = jc.groth16_vk_to_json("bls12-377", nkp.vk)

    h = svc.register_application("app", vk_json)
    assert h.startswith("0x")
    with pytest.raises(ServiceError):
        svc.register_application("app", vk_json)  # duplicate

    # submit to unknown app
    with pytest.raises(ServiceError):
        svc.submit_nested_transaction(
            {**_tx_json(nkp, 7, 1, rng), "app_name": "nope"}
        )

    svc.submit_nested_transaction(_tx_json(nkp, 7, 10, rng))
    # not enough for a batch yet
    with pytest.raises(ServiceError):
        svc.generate_aggregated_transaction("app")
    svc.submit_nested_transaction(_tx_json(nkp, 8, 5, rng))

    agg = svc.generate_aggregated_transaction("app")
    assert agg["app_name"] == "app"
    assert agg["nested_parameters"] == ["aabb", "aabb"]
    inputs = agg["ext_proof"]["inputs"]
    # fake circuit layout [vk_hash, results, in1, in2]; fee order 10 then 5
    assert int(inputs[2], 16) == 7 and int(inputs[3], 16) == 8

    # pool drained
    with pytest.raises(ServiceError):
        svc.generate_aggregated_transaction("app")


@pytest.mark.slow
def test_service_rejects_malformed_proof_points():
    svc, nkp, rng = _fake_service()
    svc.register_application(
        "app", jc.groth16_vk_to_json("bls12-377", nkp.vk)
    )
    tx = _tx_json(nkp, 7, 1, rng)
    bad = dict(tx)
    a = list(bad["extended_proof"]["proof"]["a"])
    a[0] = "0x" + "11" * 48  # not on curve
    bad["extended_proof"] = {
        **bad["extended_proof"],
        "proof": {**bad["extended_proof"]["proof"], "a": a},
    }
    with pytest.raises(ServiceError):
        svc.submit_nested_transaction(bad)


@pytest.mark.slow
def test_grpc_round_trip():
    from zecale_tpu.api import grpc_server
    from zecale_tpu.client.aggregator_client import AggregatorClient

    svc, nkp, rng = _fake_service()
    server = grpc_server.serve(svc, bind="127.0.0.1:50099", block=False)
    try:
        cli = AggregatorClient("127.0.0.1:50099")
        cfg = cli.get_configuration()
        assert cfg["nested_pairing_parameters"]["name"] == "bls12-377"
        assert cfg["wrapper_pairing_parameters"]["name"] == "bw6-761"

        vk_json = jc.groth16_vk_to_json("bls12-377", nkp.vk)
        h1 = cli.register_application("app", vk_json)
        h2 = cli.get_nested_verification_key_hash(vk_json)
        assert h1 == h2

        cli.submit_nested_transaction(_tx_json(nkp, 7, 3, rng))
        cli.submit_nested_transaction(_tx_json(nkp, 8, 4, rng))
        agg = cli.get_aggregated_transaction("app")
        assert agg["app_name"] == "app"

        # error mapping: INVALID_ARGUMENT for empty pool
        import grpc

        with pytest.raises(grpc.RpcError) as e:
            cli.get_aggregated_transaction("app")
        assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    finally:
        server.stop(None)
