"""``zecale`` command-line client.

Reference analog: client/zecale/cli (click group with subcommands,
cli/__main__.py:80-88).  Same subcommand set and default filenames
(cli/defaults.py:5-17); argparse instead of click (not in the image).

    python -m zecale_tpu.client.cli [--endpoint HOST:PORT] CMD ...

Commands:
    get-configuration
    get-verification-key   [--vk-out aggregator-vk.json]
    nested-verification-key-hash --key VK_JSON
    register --key VK_JSON --name APP
    submit   TX_JSON
    get-batch --name APP [--batch-out batch.json]
    check-batch BATCH_JSON --batch-size N
"""

from __future__ import annotations

import argparse
import json
import sys

from .aggregator_client import AggregatorClient

DEFAULT_ENDPOINT = "localhost:50052"
AGGREGATOR_VK_FILE = "aggregator-vk.json"
BATCH_FILE = "batch.json"


def _write_json(path: str, obj) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)
    print(f"wrote {path}")


def _read_json(path: str):
    with open(path) as f:
        return json.load(f)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="zecale")
    ap.add_argument("--endpoint", default=DEFAULT_ENDPOINT)
    ap.add_argument(
        "--transport", choices=["proto", "json"], default="proto",
        help="wire format: proto3 (reference-compatible schema) or the "
             "canonical-JSON fallback service",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("get-configuration")

    p = sub.add_parser("get-verification-key")
    p.add_argument("--vk-out", default=AGGREGATOR_VK_FILE)

    p = sub.add_parser("nested-verification-key-hash")
    p.add_argument("--key", required=True)

    p = sub.add_parser("register")
    p.add_argument("--key", required=True)
    p.add_argument("--name", required=True)

    p = sub.add_parser("submit")
    p.add_argument("tx_file")

    p = sub.add_parser("get-batch")
    p.add_argument("--name", required=True)
    p.add_argument("--batch-out", default=BATCH_FILE)

    p = sub.add_parser("check-batch")
    p.add_argument("batch_file")
    p.add_argument("--batch-size", type=int, required=True)

    args = ap.parse_args(argv)
    cli = AggregatorClient(args.endpoint, transport=args.transport)
    try:
        return _dispatch(args, cli)
    except Exception as e:  # surface RPC errors cleanly
        import grpc

        if isinstance(e, grpc.RpcError):
            print(f"error: {e.details()}", file=sys.stderr)
            return 1
        raise


def _dispatch(args, cli) -> int:

    if args.cmd == "get-configuration":
        print(json.dumps(cli.get_configuration(), indent=2))
    elif args.cmd == "get-verification-key":
        _write_json(args.vk_out, cli.get_verification_key())
    elif args.cmd == "nested-verification-key-hash":
        print(cli.get_nested_verification_key_hash(_read_json(args.key)))
    elif args.cmd == "register":
        h = cli.register_application(args.name, _read_json(args.key))
        print(h)
    elif args.cmd == "submit":
        cli.submit_nested_transaction(_read_json(args.tx_file))
        print("submitted")
    elif args.cmd == "get-batch":
        _write_json(args.batch_out, cli.get_aggregated_transaction(args.name))
    elif args.cmd == "check-batch":
        # results bitmask is primary input [1]
        # (reference: zecale_check_batch.py:25-31)
        batch = _read_json(args.batch_file)
        results = int(batch["ext_proof"]["inputs"][1], 16)
        print(f"results={hex(results)}")
        expect = (1 << args.batch_size) - 1
        if results != expect:
            print("at least one nested proof judged as invalid")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
