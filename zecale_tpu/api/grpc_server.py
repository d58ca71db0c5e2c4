"""gRPC transport for the aggregator service.

Service and method names are identical to the reference's
``zecale_proto.Aggregator`` (proto/zecale/api/aggregator.proto:9-41).  The
reference's message types import zeth's .proto files, which are not present
in the environment (empty submodule), so exact protobuf wire compatibility
is unattainable; messages here are canonical-JSON-encoded bodies carrying
the same fields (see proto/README.md).  grpcio's generic handler API lets
us register the service without generated stubs (grpcio-tools is not
available in the image).
"""

from __future__ import annotations

import json
import logging
from concurrent import futures
from typing import Optional

import grpc

from .service import AggregatorService, ServiceError

log = logging.getLogger("zecale.grpc")

SERVICE_NAME = "zecale_proto.Aggregator"


def _json_serializer(obj) -> bytes:
    return json.dumps(obj).encode("utf-8")


def _json_deserializer(data: bytes):
    if not data:
        return None
    return json.loads(data.decode("utf-8"))


class _Handler(grpc.GenericRpcHandler):
    def __init__(self, service: AggregatorService):
        self.svc = service
        self._methods = {
            f"/{SERVICE_NAME}/GetConfiguration": self._get_configuration,
            f"/{SERVICE_NAME}/GetVerificationKey": self._get_vk,
            f"/{SERVICE_NAME}/GetNestedVerificationKeyHash": self._get_nested_vk_hash,
            f"/{SERVICE_NAME}/RegisterApplication": self._register,
            f"/{SERVICE_NAME}/SubmitNestedTransaction": self._submit,
            f"/{SERVICE_NAME}/GenerateAggregatedTransaction": self._aggregate,
        }

    def service(self, handler_call_details):
        fn = self._methods.get(handler_call_details.method)
        if fn is None:
            return None

        def unary_unary(request, context):
            try:
                return fn(request)
            except ServiceError as e:
                context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(e))
            except Exception as e:  # -> UNKNOWN, like the reference
                log.exception("internal error")
                context.abort(grpc.StatusCode.UNKNOWN, str(e))

        return grpc.unary_unary_rpc_method_handler(
            unary_unary,
            request_deserializer=_json_deserializer,
            response_serializer=_json_serializer,
        )

    # -- method bodies -------------------------------------------------------
    def _get_configuration(self, _request):
        return self.svc.get_configuration()

    def _get_vk(self, _request):
        return self.svc.get_verification_key()

    def _get_nested_vk_hash(self, request):
        return {"hash": self.svc.get_nested_verification_key_hash(request)}

    def _register(self, request):
        h = self.svc.register_application(
            request["application_name"], request["vk"]
        )
        return {"hash": h}

    def _submit(self, request):
        self.svc.submit_nested_transaction(request)
        return {}

    def _aggregate(self, request):
        return self.svc.generate_aggregated_transaction(
            request["application_name"]
        )


def serve(
    service: AggregatorService,
    bind: str = "0.0.0.0:50052",
    max_workers: int = 1,
    block: bool = True,
):
    """Start the server.  Default bind/port matches the reference
    (aggregator_server.cpp:393-416, insecure 0.0.0.0:50052); max_workers=1
    mirrors its synchronous single-threaded service loop."""
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
    server.add_generic_rpc_handlers((_Handler(service),))
    server.add_insecure_port(bind)
    server.start()
    log.info("aggregator server listening on %s", bind)
    if block:
        server.wait_for_termination()
    return server
