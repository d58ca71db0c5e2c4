"""Native witness engine vs the Python oracle."""

import ctypes
import random

import numpy as np
import pytest

from zecale_tpu.aggregator import dummy_app as da
from zecale_tpu.ff import params as P
from zecale_tpu.native.witness import NativeR1CS, native_field


@pytest.mark.parametrize(
    "p", [P.BLS12_377_R, P.BW6_761_R, P.BW6_761_Q], ids=["fr", "frw", "fqw"]
)
def test_native_mulmod(p):
    F = native_field(p)
    if not F.available:
        pytest.skip("native engine unavailable")
    rng = random.Random(2)
    xs = [rng.randrange(p) for _ in range(32)]
    ys = [rng.randrange(p) for _ in range(32)]
    xs[0], ys[0] = 0, p - 1
    a, b = F.pack(xs), F.pack(ys)
    out = np.empty_like(a)
    F.lib.fp_mulmod_batch(
        F.ctx,
        out.ctypes.data_as(ctypes.c_void_p),
        a.ctypes.data_as(ctypes.c_void_p),
        b.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_long(32),
    )
    assert F.unpack(out) == [x * y % p for x, y in zip(xs, ys)]


def test_native_r1cs_matches_python():
    r1cs = da.dummy_app_r1cs("bls12-377")
    nat = NativeR1CS(r1cs)
    if not nat.available:
        pytest.skip("native engine unavailable")
    asg = da.dummy_app_assignment("bls12-377", 11)
    assert list(nat.abc_evaluations(asg)) == list(r1cs.abc_evaluations(asg))
    assert nat.first_failing_constraint(asg) is None
    bad = list(asg)
    bad[2] = 123
    assert nat.first_failing_constraint(bad) == 0
