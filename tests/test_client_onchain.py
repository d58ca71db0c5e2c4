"""On-chain client workflow driven ENTIRELY through the CLI commands, with
settlement running as real bytecode on the EVM chain-state file.

Mirrors the on-chain legs of the reference's scripts/test-client (:26-97)
and cli/zecale_{deploy,submit_batch}.py: deploy the dispatcher from the
aggregator VK, deploy the dummy application bound to it, settle the golden
batch with --wait (gas report), read back application state, and check the
reverts (invalid batch, replay).
"""

import json
import os

import pytest

from zecale_tpu.client import cli as zcli
from zecale_tpu.client import dummy_app_cli as app_cli
from zecale_tpu.contracts.dispatcher import inputs_to_contract_parameters
from zecale_tpu.evm import contracts_asm
from zecale_tpu.serialization import json_codec as jc

TESTDATA = "/root/reference/testdata/dummy_app"


def _cli(*argv):
    return zcli.main(list(argv))


def _app_cli(*argv):
    return app_cli.main(list(argv))


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _write_batch(path, name, params):
    with open(os.path.join(TESTDATA, name)) as f:
        batch = json.load(f)
    with open(path, "w") as f:
        json.dump(
            {
                "app_name": "dummy",
                "ext_proof": batch["ext_proof"],
                "nested_parameters": [p.hex() for p in params],
            },
            f,
        )
    ep = jc.extended_proof_from_json("bw6-761", batch["ext_proof"])
    return inputs_to_contract_parameters(ep.inputs)


def test_onchain_deploy_settle_get_flow(workdir, capsys):
    vk_path = os.path.join(TESTDATA, "aggregator_vk.json")
    params = [
        contracts_asm.encode_app_parameters(0xAAA1),
        contracts_asm.encode_app_parameters(0xBBB2),
    ]
    words = _write_batch("batch.json", "batch1.json", params)

    # deploy dispatcher (instance file) + app bound to it (vk hash 0)
    assert _cli("deploy", "--vk", vk_path, "--batch-size", "2") == 0
    assert os.path.exists("zecale-instance")
    assert _app_cli(
        "--eth-network", "eth-chain.json", "deploy", "0x0",
        "--instance", "app-instance",
    ) == 0

    # settle the golden batch through process_batch, report gas
    rc = _cli(
        "submit-batch", "batch.json", "--app-address", "app-instance",
        "--wait",
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "gasUsed = " in out

    # app state: valid result bits recorded their scalars
    results = words[3]
    scalars = [words[5], words[7]]
    for i, s in enumerate(scalars):
        rc = _app_cli(
            "--eth-network", "eth-chain.json", "get", hex(s),
            "--instance", "app-instance",
            "--check", hex([0xAAA1, 0xBBB2][i]),
        )
        expect_rc = 0 if (results >> i) & 1 else 1
        assert rc == expect_rc, (i, s)

    # replaying the same batch reverts (scalar already seen)
    if results & 1:
        assert _cli(
            "submit-batch", "batch.json", "--app-address", "app-instance",
        ) == 1


def test_onchain_invalid_batch_reverts(workdir):
    vk_path = os.path.join(TESTDATA, "aggregator_vk.json")
    params = [contracts_asm.encode_app_parameters(1)] * 2
    _write_batch("bad.json", "batch1-invalid.json", params)
    assert _cli("deploy", "--vk", vk_path, "--batch-size", "2") == 0
    assert _app_cli(
        "--eth-network", "eth-chain.json", "deploy", "0x0",
        "--instance", "app-instance",
    ) == 0
    assert _cli(
        "submit-batch", "bad.json", "--app-address", "app-instance",
    ) == 1


def test_config_cache_roundtrip_and_invalidation(workdir):
    """The lazily-fetched server config is cached and a corrupt cache is
    discarded (reference command_context.py:79-96)."""
    ctx = zcli.CommandContext("localhost:1", "json", "eth-chain.json")
    with open(zcli.CONFIG_CACHE_FILE, "w") as f:
        json.dump({"snark": "GROTH16"}, f)
    assert ctx.config() == {"snark": "GROTH16"}  # no server contact
    # corrupt cache: context must remove it (and would re-fetch)
    with open(zcli.CONFIG_CACHE_FILE, "w") as f:
        f.write("{corrupt")
    ctx2 = zcli.CommandContext("localhost:1", "json", "eth-chain.json")
    try:
        ctx2.config()
    except Exception:
        pass  # no live server — the fetch fails, which is fine here
    assert not os.path.exists(zcli.CONFIG_CACHE_FILE)
