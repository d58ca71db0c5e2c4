"""Differential tests for the round-2 MSM engine (ec/msm8.py) against the
host oracle, with edge cases: zero scalars, duplicate points, infinity
inputs, all-equal digits (worst-case bucket skew).

All G1 tests share ONE (n, c) shape so the (expensive) CPU compile of the
MSM graph happens once per group.
"""

import random

import numpy as np
import pytest

from zecale_tpu.ec import host_curve as hc
from zecale_tpu.ec import msm8
from zecale_tpu.ff import fp8
from zecale_tpu.ff import params as P

CURVE = "bls12-377"
N, C = 64, 6  # shared shape for all G1 tests


def _points(n, rng, curve=CURVE, g2=False):
    crv = hc.g2_curve(curve) if g2 else hc.g1_curve(curve)
    gen = hc.generators(curve)[1 if g2 else 0]
    pts = []
    p = gen
    for _ in range(n):
        pts.append(p)
        p = crv.add(crv.dbl(p), gen)
    rng.shuffle(pts)
    return pts


def test_signed_digits_roundtrip():
    r = P.CURVES[CURVE].r
    rng = random.Random(5)
    scalars = [rng.randrange(r) for _ in range(10)] + [0, 1, r - 1]
    Fr = fp8.field8(r)
    scal8 = Fr.pack(scalars, mont=False)
    c = 13
    buckets, signs = msm8.signed_digits_from_limbs8(
        scal8, r.bit_length(), c
    )
    b = np.asarray(buckets)
    s = np.asarray(signs)
    W = b.shape[0]
    for i, sc in enumerate(scalars):
        acc = 0
        for w in range(W):
            d = int(b[w, i]) * (-1 if s[w, i] else 1)
            assert abs(d) <= 1 << (c - 1)
            acc += d << (c * w)
        assert acc == sc


def test_msm8_g1_differential():
    rng = random.Random(42)
    r = P.CURVES[CURVE].r
    pts = _points(N, rng)
    scalars = [rng.randrange(r) for _ in range(N)]
    # edge cases: zero scalar, duplicate points, infinity
    scalars[0] = 0
    pts[1] = pts[2]
    pts[3] = None
    got = msm8.msm8(CURVE, scalars, pts, c=C)
    crv = hc.g1_curve(CURVE)
    expect = crv.msm(
        [s for s, p in zip(scalars, pts) if p is not None],
        [p for p in pts if p is not None],
    )
    assert got == expect


def test_msm8_g1_skewed_digits():
    """All-equal scalars: every point lands in the same bucket (worst-case
    combining depth — the adaptive while_loop tail must run its full
    log2(width) rounds instead of the average-case few)."""
    rng = random.Random(7)
    pts = _points(N, rng)
    r = P.CURVES[CURVE].r
    s = rng.randrange(r)
    scalars = [s] * N
    got = msm8.msm8(CURVE, scalars, pts, c=C)
    expect = hc.g1_curve(CURVE).msm(scalars, pts)
    assert got == expect


def test_msm8_g1_tiny_and_identity():
    """Tiny cases padded to the shared shape (no extra compile)."""
    rng = random.Random(3)
    r = P.CURVES[CURVE].r
    pts = _points(4, rng) + [None] * (N - 4)
    z = [0] * (N - 4)
    assert msm8.msm8(CURVE, [0, 0, 0, 0] + z, pts, c=C) is None
    got = msm8.msm8(CURVE, [1, 0, 0, 0] + z, pts, c=C)
    assert got == pts[0]
    got = msm8.msm8(CURVE, [1, 1, r - 1, 2] + z, pts, c=C)
    crv = hc.g1_curve(CURVE)
    assert got == crv.msm([1, 1, r - 1, 2], pts[:4])


@pytest.mark.slow
def test_msm8_g2_differential():
    rng = random.Random(11)
    n = 48
    pts = _points(n, rng, g2=True)
    r = P.CURVES[CURVE].r
    scalars = [rng.randrange(r) for _ in range(n)]
    scalars[5] = 0
    pts[7] = None
    got = msm8.msm8(CURVE, scalars, pts, g2=True, c=C)
    crv = hc.g2_curve(CURVE)
    expect = crv.msm(
        [s for s, p in zip(scalars, pts) if p is not None],
        [p for p in pts if p is not None],
    )
    assert got == expect


@pytest.mark.slow
def test_msm8_bw6_g1_differential():
    rng = random.Random(13)
    n = 40
    pts = _points(n, rng, curve="bw6-761")
    r = P.CURVES["bw6-761"].r
    scalars = [rng.randrange(r) for _ in range(n)]
    got = msm8.msm8("bw6-761", scalars, pts, c=C)
    expect = hc.g1_curve("bw6-761").msm(scalars, pts)
    assert got == expect


@pytest.mark.slow
def test_msm8_chunked_matches_oracle():
    """Window-chunked MSM (the HBM-bounded prover path) == host oracle,
    including an uneven tail chunk."""
    rng = random.Random(17)
    pts = _points(N, rng)
    r = P.CURVES[CURVE].r
    scalars = [rng.randrange(r) for _ in range(N)]
    Fr8 = fp8.field8(r)
    scal8 = Fr8.pack(scalars, mont=False)
    pts_dev = msm8.pack_points_affine8(CURVE, pts)
    got = msm8.msm8_chunked_host(
        CURVE, False, C, scal8, pts_dev, chunks=3, use_pallas=False
    )
    expect = hc.g1_curve(CURVE).msm(scalars, pts)
    assert got == expect


def test_msm8_streamed_matches_oracle():
    """One-jit window-streamed MSM (the round-3 HBM-bounded prover path)
    == host oracle, including an uneven tail chunk and edge cases."""
    rng = random.Random(23)
    pts = _points(N, rng)
    pts[2] = None
    r = P.CURVES[CURVE].r
    scalars = [rng.randrange(r) for _ in range(N)]
    scalars[0] = 0
    Fr8 = fp8.field8(r)
    scal8 = Fr8.pack(scalars, mont=False)
    pts_dev = msm8.pack_points_affine8(CURVE, pts)
    dev = msm8.msm8_streamed_jit(CURVE, False, C, 3, use_pallas=False)(
        scal8, pts_dev
    )
    got = msm8.unpack_jac_point8(CURVE, dev)
    expect = hc.g1_curve(CURVE).msm(
        [s for s, p in zip(scalars, pts) if p is not None],
        [p for p in pts if p is not None],
    )
    assert got == expect
