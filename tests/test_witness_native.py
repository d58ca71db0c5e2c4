"""Differential tests for the native witness hook-replay engine
(csrc/witness_engine.c hook_replay + native/witness.HookProgram) against
the pure-Python closure loop — every bytecode kind plus the Python-
fallback segmentation.

Reference analog: witness generation inside aggregator_circuit.tcc:119-170
runs native C++; round 3's Python loop was the VERDICT's item-4 wall."""

import random

import pytest

from zecale_tpu.ff import params as P
from zecale_tpu.gadgets import packing
from zecale_tpu.gadgets.protoboard import LC, Protoboard
from zecale_tpu.native import witness as nw

pytestmark = pytest.mark.skipif(
    nw._lib() is None, reason="native toolchain unavailable"
)


def _build_mixed_pb(r):
    """A protoboard exercising mul, div, invz, assign, unpack, xor and an
    unstructured Python hook sandwiched between structured segments."""
    pb = Protoboard(r)
    x = LC.of_var(pb.allocate_primary())
    y = LC.of_var(pb.allocate_primary())
    pb.seal_primary()

    v1 = pb.mul(x + LC.const(3), y)          # mul
    v2 = pb.div(v1, x)                        # div (x != 0 in the test)
    ai, nz = pb.inv_or_zero(x - y)            # invz
    v3 = pb.mul(v2 + ai, nz + LC.const(1))

    # unstructured Python hook (forces a native-segment break): computes
    # a cube the bytecode doesn't know about
    cube = pb.allocate()

    def fn(w, _v=cube, _s=v3, _pb=pb):
        s = _pb.lc_val(w, _s)
        w[_v] = pow(s, 3, _pb.r)

    pb.add_hook(fn)
    pb.add_r1cs(v3, pb.mul(v3, v3), LC.of_var(cube))

    bits = packing.unpack_bits(pb, v1, 24)    # unpack

    # xor of two known bits via the structured op
    b0, b1 = bits[0], bits[1]
    xv = pb.allocate()

    def fx(w, _x=b0, _y=b1, _v=xv, _pb=pb):
        w[_v] = _pb.lc_val(w, _x) ^ _pb.lc_val(w, _y)

    pb.add_hook(fx, op=("xor", xv, b0, b1))

    # assign op
    s = pb.allocate()

    def fa(w, _v=s, _lc=v1 + v2, _pb=pb):
        w[_v] = _pb.lc_val(w, _lc)

    pb.add_hook(fa, op=("assign", s, v1 + v2))
    return pb


@pytest.mark.parametrize(
    "r",
    [
        P.CURVES["bw6-761"].r,   # 377-bit (the wrapper Fr)
        P.CURVES["mnt6-298"].r,  # 298-bit
    ],
)
def test_hook_replay_matches_python(r):
    pb = _build_mixed_pb(r)
    rng = random.Random(3)
    primary = [rng.randrange(2, r), rng.randrange(2, r)]

    # pure python
    w_py = [0] * pb._num_vars
    w_py[0] = 1
    for i, v in enumerate(primary):
        w_py[1 + i] = v % r
    for hook in pb.witness_hooks:
        hook(w_py)

    prog = nw.HookProgram(pb)
    assert prog.available
    # program has py-fallback segments between native runs
    kinds = [k for k, _ in prog.segments]
    assert "py" in kinds and "c" in kinds

    w0 = [0] * pb._num_vars
    w0[0] = 1
    for i, v in enumerate(primary):
        w0[1 + i] = v % r
    w_c = prog.run(w0)
    assert w_c == w_py


def test_generate_witness_routes_native(monkeypatch):
    r = P.CURVES["bw6-761"].r
    pb = _build_mixed_pb(r)
    w_nat = pb.generate_witness([5, 9])
    monkeypatch.setenv("ZECALE_PY_WITNESS", "1")
    w_py = pb.generate_witness([5, 9])
    assert w_nat == w_py
    # the replayed witness satisfies the recorded constraints
    assert pb.to_r1cs().first_failing_constraint(w_nat) is None


def test_hook_replay_zero_divisor_total_semantics():
    """div/invz hooks are witness-total: zero divisors assign 0."""
    r = P.CURVES["bw6-761"].r
    pb = Protoboard(r)
    x = LC.of_var(pb.allocate_primary())
    pb.seal_primary()
    v = pb.div(LC.const(0), x)       # 0/0 -> 0 with x = 0
    ai, nz = pb.inv_or_zero(x)
    prog = nw.HookProgram(pb)
    w = prog.run([1, 0, 0, 0, 0])
    w_py = [1, 0, 0, 0, 0]
    for hook in pb.witness_hooks:
        hook(w_py)
    assert w == w_py
    assert w[2] == 0 and w[4] == 0  # div result, nz bit
