"""Sanitizer-build gate for the native C engine.

The reference compiles its whole tree with clang sanitizers via
``-DSANITIZER=<Address|Undefined|...>``
(/root/reference/cmake/sanitizers.cmake:17-91, README.md:90-99).  The
TPU-native analog rebuilds csrc/ with gcc ASan/UBSan
(ZECALE_NATIVE_SANITIZE, zecale_tpu/native/ec.py) and drives the
field/curve/pairing/witness entry points in a child interpreter
(scripts/sanitize_check.py, `make sanitize`).
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_REPO, "scripts", "sanitize_check.py")


def _flags_reach_build(mode):
    """The sanitized .so must actually carry sanitizer runtime symbols —
    guards against the env plumbing silently dropping the flags."""
    out = subprocess.run(
        ["nm", "-D", _so_for(mode)], capture_output=True, text=True
    ).stdout
    needle = "__asan" if mode == "address" else "__ubsan"
    assert needle in out, f"no {needle} symbols in the {mode} build"


def _so_for(mode):
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), f"zecale_native.{mode}.so"
    )


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["Undefined", "Address"])
def test_native_engine_clean_under_sanitizer(mode):
    res = subprocess.run(
        [sys.executable, _SCRIPT, mode],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert res.returncode == 0, (
        f"sanitize_check {mode} failed:\n{res.stdout}\n{res.stderr}"
    )
    _flags_reach_build(mode.lower())


def test_sanitize_mode_plumbing(monkeypatch):
    """Fast check: the env var selects distinct .so paths and flags
    without rebuilding anything."""
    from zecale_tpu.native import ec as nec

    monkeypatch.delenv("ZECALE_NATIVE_SANITIZE", raising=False)
    assert nec.sanitize_mode() == ""
    assert nec._so_path("x").endswith("x.so")
    monkeypatch.setenv("ZECALE_NATIVE_SANITIZE", "address")
    assert nec.sanitize_mode() == "address"
    assert nec._so_path("x").endswith("x.address.so")
    assert "-fsanitize=address" in nec._SAN_FLAGS["address"]
    monkeypatch.setenv("ZECALE_NATIVE_SANITIZE", "undefined")
    assert "-fsanitize=undefined" in nec._SAN_FLAGS[nec.sanitize_mode()]
