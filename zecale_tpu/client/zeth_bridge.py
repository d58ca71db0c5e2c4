"""Bridge from an application client's proof bundle to a Zecale nested
transaction (reference analog: client/zeth_zecale create-nested-tx,
create_nested_tx.py:17-63 — there the bundle is a Zeth MixParameters file
whose mix parameters become the dispatch `parameters` blob).

The zeth package is not available in this environment, so the bridge
accepts the generic bundle shape

    { "extended_proof": {"proof": ..., "inputs": [...]},
      "parameters": "<hex>" }            (or any app-specific payload dict)

and emits the nested-transaction JSON the aggregator accepts.

    python -m zecale_tpu.client.zeth_bridge create-nested-tx \
        BUNDLE_JSON --app NAME [--fee N] [--out tx.json]
"""

from __future__ import annotations

import argparse
import json
import sys


def create_nested_tx(
    bundle: dict, app_name: str, fee_in_wei: int = 0
) -> dict:
    ep = bundle["extended_proof"]
    params = bundle.get("parameters", "")
    if isinstance(params, (dict, list)):
        # app-specific structured payload: canonical-JSON-encode to bytes
        params = json.dumps(params, sort_keys=True).encode().hex()
    return {
        "app_name": app_name,
        "extended_proof": ep,
        "parameters": params,
        "fee_in_wei": fee_in_wei,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="zeth_zecale")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("create-nested-tx")
    p.add_argument("bundle_file")
    p.add_argument("--app", required=True)
    p.add_argument("--fee", type=int, default=0)
    p.add_argument("--out", default="nested-tx.json")
    args = ap.parse_args(argv)

    with open(args.bundle_file) as f:
        bundle = json.load(f)
    tx = create_nested_tx(bundle, args.app, args.fee)
    with open(args.out, "w") as f:
        json.dump(tx, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
