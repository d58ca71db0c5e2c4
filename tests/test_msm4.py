"""Differential tests for the round-4 dense-bucket MSM engine (ec/msm4.py)
against the host oracle, covering the jnp reference path, the Pallas
kernel (interpreter mode on CPU), signed-digit/window edge cases,
adversarial bucket overflow (layered while_loop), infinity inputs, and
both curve families + BLS12-377 G2.

Mirrors the multiexp correctness surface of libff (SURVEY section 2b).
"""

import random

import pytest

from zecale_tpu.ec import host_curve as hc, msm4, msm8
from zecale_tpu.ff import fp8
from zecale_tpu.ff import params as P


def _host_msm(curve, scalars, pts, g2=False):
    crv = hc.g2_curve(curve) if g2 else hc.g1_curve(curve)
    acc = None
    for s, p in zip(scalars, pts):
        if p is None or s == 0:
            continue
        t = crv.mul(s % P.CURVES[curve].r, p)
        if t is None:
            continue
        acc = t if acc is None else crv.add(acc, t)
    return acc


def _points(curve, n, g2=False, rng=None):
    crv = hc.g2_curve(curve) if g2 else hc.g1_curve(curve)
    gen = hc.generators(curve)[1 if g2 else 0]
    pts = []
    pt = gen
    for _ in range(n):
        pts.append(pt)
        pt = crv.dbl(pt)
    return pts


@pytest.mark.parametrize(
    "curve",
    [
        "bls12-377",
        pytest.param("bw6-761", marks=pytest.mark.slow),
    ],
)
@pytest.mark.parametrize("use_pallas", [False, True])
def test_msm4_matches_host_g1(curve, use_pallas):
    rng = random.Random(7)
    r = P.CURVES[curve].r
    n = 300  # not a power of two on purpose
    pts = _points(curve, n)
    scalars = [rng.randrange(r) for _ in range(n)]
    got = msm4.msm4(curve, scalars, pts, use_pallas=use_pallas)
    assert got == _host_msm(curve, scalars, pts)


@pytest.mark.slow
@pytest.mark.parametrize("use_pallas", [False, True])
def test_msm4_matches_host_g2_fq2(use_pallas):
    rng = random.Random(8)
    curve = "bls12-377"
    r = P.CURVES[curve].r
    n = 100
    pts = _points(curve, n, g2=True)
    scalars = [rng.randrange(r) for _ in range(n)]
    got = msm4.msm4(curve, scalars, pts, g2=True,
                    use_pallas=use_pallas)
    assert got == _host_msm(curve, scalars, pts, g2=True)


@pytest.mark.slow
def test_msm4_bw6_g2_b3_12():
    rng = random.Random(9)
    curve = "bw6-761"
    r = P.CURVES[curve].r
    n = 40
    pts = _points(curve, n, g2=True)
    scalars = [rng.randrange(r) for _ in range(n)]
    got = msm4.msm4(curve, scalars, pts, g2=True, use_pallas=False)
    assert got == _host_msm(curve, scalars, pts, g2=True)


def test_msm4_edge_scalars_and_infinity():
    curve = "bls12-377"
    r = P.CURVES[curve].r
    pts = _points(curve, 8)
    pts[3] = None  # infinity input
    scalars = [0, 1, r - 1, 12345, 1, 2, r // 2, 0]
    got = msm4.msm4(curve, scalars, pts, use_pallas=False)
    assert got == _host_msm(curve, scalars, pts)


@pytest.mark.slow
def test_msm4_adversarial_equal_scalars_overflow_layers():
    """All-equal scalars put every point in the same bucket per window —
    counts >> capacity force the layered while_loop path."""
    curve = "bls12-377"
    r = P.CURVES[curve].r
    n = 100
    pts = _points(curve, n)
    s = 0x1234567890ABCDEF1234567890ABCDEF % r
    scalars = [s] * n
    got = msm4.msm4(curve, scalars, pts, use_pallas=False)
    assert got == _host_msm(curve, scalars, pts)


@pytest.mark.slow
def test_msm4_agrees_with_msm8():
    rng = random.Random(10)
    curve = "bls12-377"
    r = P.CURVES[curve].r
    n = 120
    pts = _points(curve, n)
    scalars = [rng.randrange(r) for _ in range(n)]
    a = msm4.msm4(curve, scalars, pts, use_pallas=False)
    b = msm8.msm8(curve, scalars, pts, use_pallas=False)
    assert a == b
