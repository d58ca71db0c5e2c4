"""Differential tests for the native EC engine (csrc/ec_engine.c) against
the Python host oracle: MSM (incl. infinity/duplicate/zero edge cases),
fixed-base batches, FFT, and jac->affine batch conversion."""

import random

import numpy as np
import pytest

from zecale_tpu.ec import host_curve as hc
from zecale_tpu.ff import params as P
from zecale_tpu.native import ec as nec
from zecale_tpu.poly import domain_host

pytestmark = pytest.mark.skipif(
    not nec.available(), reason="native toolchain unavailable"
)


def _pts(curve, n, rng, g2=False):
    crv = hc.g2_curve(curve) if g2 else hc.g1_curve(curve)
    gen = hc.generators(curve)[1 if g2 else 0]
    out, p = [], gen
    for _ in range(n):
        out.append(p)
        p = crv.add(crv.dbl(p), gen)
    rng.shuffle(out)
    return out


@pytest.mark.parametrize("curve,g2", [
    ("bls12-377", False),
    ("bls12-377", True),
    ("bw6-761", False),
    ("mnt4-298", False),
    ("mnt4-298", True),
    ("mnt6-298", True),
])
def test_native_msm_differential(curve, g2):
    rng = random.Random(5)
    n = 40
    pts = _pts(curve, n, rng, g2=g2)
    r = P.CURVES[curve].r
    scalars = [rng.randrange(r) for _ in range(n)]
    scalars[0] = 0
    pts[1] = pts[2]
    pts[3] = None
    nc = nec.NativeCurve(curve, g2=g2)
    got = nc.msm(scalars, pts, c=5)
    crv = hc.g2_curve(curve) if g2 else hc.g1_curve(curve)
    expect = crv.msm(
        [s for s, p in zip(scalars, pts) if p is not None],
        [p for p in pts if p is not None],
    )
    assert got == expect


def test_native_msm_all_zero():
    nc = nec.NativeCurve("bls12-377")
    pts = _pts("bls12-377", 4, random.Random(0))
    assert nc.msm([0, 0, 0, 0], pts) is None


def test_native_fixed_base_batch():
    rng = random.Random(9)
    curve = "bw6-761"
    r = P.CURVES[curve].r
    gen = hc.generators(curve)[0]
    crv = hc.g1_curve(curve)
    scalars = [rng.randrange(r) for _ in range(7)] + [0, 1]
    nc = nec.NativeCurve(curve)
    got = nc.fixed_base_mul_batch(scalars, gen, c=6)
    expect = [crv.mul(s, gen) if s else None for s in scalars]
    assert got == expect


def test_native_fft_matches_host_domain():
    rng = random.Random(3)
    r = P.CURVES["bw6-761"].r
    n = 64
    d = domain_host.domain(n, r)
    vals = [rng.randrange(r) for _ in range(n)]
    F = nec.NativeScalarField(r)
    arr = F.to_mont(vals)
    F.fft_inplace(arr, d.omega)
    got = F.from_mont(arr)
    expect = d.fft(vals)
    assert got == expect
    # inverse round-trip
    arr2 = F.to_mont(got)
    F.fft_inplace(arr2, d.omega_inv, sinv=pow(n, r - 2, r))
    assert F.from_mont(arr2) == vals
