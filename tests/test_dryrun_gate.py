"""Regression test for the driver's multichip gate (VERDICT round-2 #1).

The driver invokes __graft_entry__.dryrun_multichip under the image's
DEFAULT environment: JAX_PLATFORMS=axon, PALLAS_AXON_POOL_IPS set, and the
axon sitecustomize on PYTHONPATH — an environment in which importing jax
can route through the remote TPU tunnel and block forever
(MULTICHIP_r02.json: rc=124, empty output).  dryrun_multichip must
therefore be fully self-contained: it re-execs itself in a scrubbed
CPU-only subprocess regardless of the caller's environment.

This test reproduces the hostile caller environment (without needing a
real tunnel) and requires the gate to pass from it.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_from_hostile_env():
    env = dict(os.environ)
    # The driver's environment: axon platform + pool IPs + axon site dir.
    # dryrun_multichip must scrub ALL of this before the child imports jax.
    env["JAX_PLATFORMS"] = "axon"
    env["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
    env["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, %r); "
            "import __graft_entry__ as ge; ge.dryrun_multichip(8)" % REPO,
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, (
        f"gate failed rc={proc.returncode}\nstdout: {proc.stdout[-2000:]}"
        f"\nstderr: {proc.stderr[-2000:]}"
    )
    assert "value-match the host oracle" in proc.stdout


def test_scrubbed_env_is_clean(monkeypatch):
    """The child env must have no axon/pallas residue and correct flags."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    env = ge._scrubbed_env(8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert not any("AXON" in k for k in env)
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert ".axon_site" not in env.get("PYTHONPATH", "")
    assert env[ge._CHILD_FLAG] == "1"


@pytest.mark.slow
def test_multihost_process_group_dryrun():
    """2 CPU processes x 4 devices via jax.distributed.initialize: the
    sharded iFFT's ppermute exchanges cross the process boundary (Gloo)
    and the gathered result value-matches the host oracle."""
    env = {
        k: v
        for k, v in os.environ.items()
        if "AXON" not in k and not k.startswith("PALLAS_")
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_dryrun.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=660,
    )
    assert proc.returncode == 0, proc.stdout[-1500:] + proc.stderr[-1500:]
    assert "MULTIHOST OK" in proc.stdout
