"""aggregator-server entry point.

Reference analog: aggregator_server/aggregator_server.cpp main (:418-521):
load-or-generate the wrapper keypair (cached on disk), optionally dump the
R1CS, then serve the gRPC API.  Unlike the reference's compile-time
constants (batch_size=2, 1 input/proof hard-coded at :71-72), batch size,
input count and proving backend are runtime flags here.

Usage:
    python -m zecale_tpu.api.server_main [--keypair PATH] [--batch-size N]
        [--inputs-per-proof N] [--bind HOST:PORT] [--r1cs PATH]
        [--prover host|tpu]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import pickle
import sys
import time


def load_or_generate_keypair(circuit, path: str, prover=None):
    if os.path.exists(path):
        logging.info("loading keypair from %s", path)
        with open(path, "rb") as f:
            kp = pickle.load(f)
        # vk shape check, like the reference (aggregator_server.cpp:490,502)
        expect = circuit.num_primary_inputs + 1
        if len(kp.vk.abc) != expect:
            raise ValueError(
                f"keypair vk shape {len(kp.vk.abc)} != expected {expect}"
            )
        return kp
    logging.info("generating trusted setup (this can take a while)...")
    t0 = time.time()
    kp = circuit.generate_trusted_setup(prover=prover)
    logging.info("setup done in %.1fs; writing %s", time.time() - t0, path)
    with open(path, "wb") as f:
        pickle.dump(kp, f)
    return kp


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO, format="[%(levelname)s] %(message)s"
    )
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--keypair",
        default=os.environ.get(
            "ZECALE_SETUP_DIR", os.path.expanduser("~/.zecale")
        )
        + "/zecale_keypair.bin",
    )
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--inputs-per-proof", type=int, default=1)
    ap.add_argument("--bind", default="0.0.0.0:50052")
    ap.add_argument(
        "--r1cs", default=None, help="dump the wrapper R1CS to this JSON path"
    )
    ap.add_argument(
        "--prover", choices=["host", "native", "tpu"], default="tpu",
        help="tpu = JAX/Pallas prover; native = C engine (no accelerator); "
             "host = pure-Python oracle",
    )
    ap.add_argument(
        "--snark",
        choices=["GROTH16", "PGHR13"],
        default="GROTH16",
        help="wrapper snark (reference ZECALE_SNARK CMake option)",
    )
    ap.add_argument(
        "--nested-snark",
        choices=["GROTH16", "PGHR13"],
        default="GROTH16",
        help="in-circuit nested verifier family (nverifierT trait)",
    )
    ap.add_argument(
        "--curve",
        choices=["bw6-761", "mnt6-298"],
        default="bw6-761",
        help="wrapper curve (reference ZECALE_CURVE CMake option)",
    )
    args = ap.parse_args(argv)

    from ..aggregator.circuit import AggregatorCircuit
    from . import grpc_server
    from .service import AggregatorService

    logging.info(
        "building aggregator circuit (batch=%d, inputs/proof=%d)...",
        args.batch_size,
        args.inputs_per_proof,
    )
    t0 = time.time()
    circuit = AggregatorCircuit(
        args.inputs_per_proof,
        args.batch_size,
        wrapper_curve=args.curve,
        nested_snark=args.nested_snark,
        wrapper_snark=args.snark,
    )
    logging.info(
        "circuit ready in %.1fs: %d constraints",
        time.time() - t0,
        circuit.r1cs.num_constraints,
    )

    prover = None
    if args.prover == "tpu":
        if args.snark == "GROTH16":
            from ..snark.groth16_tpu import Groth16TPU

            prover = Groth16TPU(args.curve)
        else:
            from ..snark.pghr13_tpu import Pghr13TPU

            prover = Pghr13TPU(args.curve)
    elif args.prover == "native":
        assert args.snark == "GROTH16", "native prover supports GROTH16"
        from ..snark.groth16_native import Groth16Native

        prover = Groth16Native(args.curve)

    if args.r1cs:
        rows, = ({"constraints": circuit.r1cs.num_constraints},)
        with open(args.r1cs, "w") as f:
            json.dump(
                {
                    "num_constraints": circuit.r1cs.num_constraints,
                    "num_variables": circuit.r1cs.num_variables,
                    "num_primary": circuit.r1cs.num_primary,
                },
                f,
            )
        logging.info("r1cs summary written to %s", args.r1cs)

    os.makedirs(os.path.dirname(args.keypair), exist_ok=True)
    keypair = load_or_generate_keypair(circuit, args.keypair, prover)

    svc = AggregatorService(circuit, keypair, prover=prover)
    grpc_server.serve(svc, bind=args.bind)
    return 0


if __name__ == "__main__":
    sys.exit(main())
