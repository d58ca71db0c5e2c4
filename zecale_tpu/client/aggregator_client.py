"""Python client for the aggregator service (reference analog:
client/zecale/core/aggregator_client.py — one method per RPC)."""

from __future__ import annotations

import json
from typing import List, Optional

import grpc

from ..api.grpc_server import SERVICE_NAME, _json_deserializer, _json_serializer
from ..serialization import json_codec as jc
from ..snark.groth16 import ExtendedProof, Groth16VerificationKey


class AggregatorClient:
    def __init__(self, endpoint: str = "localhost:50052"):
        self.channel = grpc.insecure_channel(endpoint)

    def _call(self, method: str, request):
        callable_ = self.channel.unary_unary(
            f"/{SERVICE_NAME}/{method}",
            request_serializer=_json_serializer,
            response_deserializer=_json_deserializer,
        )
        return callable_(request)

    # -- RPCs ----------------------------------------------------------------
    def get_configuration(self) -> dict:
        return self._call("GetConfiguration", {})

    def get_verification_key(self) -> dict:
        return self._call("GetVerificationKey", {})

    def get_nested_verification_key_hash(self, vk_json: dict) -> str:
        return self._call("GetNestedVerificationKeyHash", vk_json)["hash"]

    def register_application(self, name: str, vk_json: dict) -> str:
        return self._call(
            "RegisterApplication", {"application_name": name, "vk": vk_json}
        )["hash"]

    def submit_nested_transaction(self, tx_json: dict) -> None:
        self._call("SubmitNestedTransaction", tx_json)

    def get_aggregated_transaction(self, name: str) -> dict:
        return self._call(
            "GenerateAggregatedTransaction", {"application_name": name}
        )
