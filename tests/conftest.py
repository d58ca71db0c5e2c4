"""Test configuration.

Unit tests run JAX on a *virtual 8-device CPU mesh* so multi-chip sharding
logic is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; real-TPU benchmarking happens in bench.py only).
"""

import os

# Must be set before the first jax import anywhere in the test process.
# The image's sitecustomize registers the remote axon TPU backend whenever
# PALLAS_AXON_POOL_IPS is set and forces JAX_PLATFORMS=axon; tests must run
# on the local CPU backend (the single real TPU chip is reserved for
# bench.py), so drop the trigger variable and force cpu.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest

# Persistent XLA compilation cache: the limb-arithmetic kernels (especially
# the Fp2 G2 scan bodies) take minutes to compile on the CPU backend; cache
# them across test processes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_zecale")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="run slow full-recursion tests",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip_slow = pytest.mark.skip(reason="slow test: pass --run-slow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow full-recursion test")
