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


@pytest.mark.parametrize("use_pallas", [False, True])
def test_msm4_bit_heavy_witness_distribution(use_pallas):
    """Witness-like scalars (mostly 0/1 wire values + a few full-size
    elements) flood single buckets of window 0 — the rank-ladder must
    absorb them without capacity-layer storms (round-4 regression: this
    distribution crashed the TPU worker via ~280 layer passes)."""
    rng = random.Random(11)
    curve = "bls12-377"
    r = P.CURVES[curve].r
    n = 300
    pts = _points(curve, n)
    scalars = []
    for i in range(n):
        roll = rng.random()
        if roll < 0.45:
            scalars.append(1)
        elif roll < 0.65:
            scalars.append(0)
        elif roll < 0.8:
            scalars.append(rng.randrange(2, 64))
        else:
            scalars.append(rng.randrange(r))
    from zecale_tpu.ff import fp8

    Fr8 = fp8.field8(r)
    scal8 = Fr8.pack([s % r for s in scalars], mont=False)
    calib = msm4.calibrate_slanes(curve, False, n, scal8)
    from zecale_tpu.ec import msm8 as m8

    pts_dev = m8.pack_points_affine8(curve, pts)
    acc = msm4.msm4_jit(curve, False, n, 0, use_pallas, calib)(
        scal8, pts_dev
    )
    got = m8.unpack_jac_point8(curve, acc)
    assert got == _host_msm(curve, scalars, pts)
    if not use_pallas:
        # un-calibrated path must ALSO be correct (layers fire); one
        # variant keeps the fast suite inside its compile budget
        got2 = msm4.msm4(curve, scalars, pts, use_pallas=False)
        assert got2 == _host_msm(curve, scalars, pts)


def _bit_heavy(rng, r, n):
    out = []
    for _ in range(n):
        roll = rng.random()
        if roll < 0.45:
            out.append(1)
        elif roll < 0.65:
            out.append(0)
        elif roll < 0.8:
            out.append(rng.randrange(2, 64))
        else:
            out.append(rng.randrange(r))
    return out


def test_msm4_calibrated_guard_indexes_flat_windows():
    """ADVICE r4 high regression: with a calibrated plan, window 0 is a
    LADDER window, so reg_wins does not start at 0.  The overflow-layer
    guard must (a) not re-trigger capacity layers for ladder-absorbed
    window-0 floods, and (b) still catch a flood in the LAST flat window
    (the positional prefix slice counts[:len(reg)] did neither)."""
    import jax.numpy as jnp
    import numpy as np

    curve = "bls12-377"
    r = P.CURVES[curve].r
    n = 300
    rng = random.Random(13)
    Fr8 = fp8.field8(r)

    calib_scalars = _bit_heavy(rng, r, n)
    scal8_cal = Fr8.pack([s % r for s in calib_scalars], mont=False)
    calib = msm4.calibrate_slanes(curve, False, n, scal8_cal)
    plan = msm4.make_plan(curve, False, n, 0, calib)
    assert plan.reg_wins and plan.reg_wins[0] != 0, (
        "precondition: calibration must ladder window 0"
    )

    # (a) layer economy: running the SAME distribution the plan was
    # calibrated for, no flat-window bucket exceeds capacity, so the
    # while_loop guard over the flat rows must not fire at layer 1.
    from zecale_tpu.ec.msm8 import signed_digits_from_limbs8

    nbits = r.bit_length()
    buckets, signs = signed_digits_from_limbs8(scal8_cal, nbits, plan.c)
    inf = jnp.zeros((buckets.shape[1],), bool)
    keys = msm4._build_keys(plan, buckets, signs, inf)
    skeys = jnp.sort(keys, axis=1)
    _, counts = msm4._starts_counts(plan, skeys)
    reg_rows = np.asarray(counts)[np.asarray(plan.reg_wins)]
    assert int(reg_rows.max()) <= plan.C, (
        "ladder-absorbed flood must not leak into the flat-window guard"
    )

    # (b) dropped-points correctness: flood one bucket of the LAST flat
    # window (same digit there for every point) under the window-0
    # calibrated plan; the layer loop must absorb it.
    last_flat = plan.reg_wins[-1]
    base = 5 << (plan.c * last_flat)
    flood_scalars = [base + (calib_scalars[i] & 1) for i in range(n)]
    pts = _points(curve, n)
    scal8_fl = Fr8.pack([s % r for s in flood_scalars], mont=False)
    pts_dev = msm8.pack_points_affine8(curve, pts)
    acc = msm4.msm4_jit(curve, False, n, 0, False, calib)(
        scal8_fl, pts_dev
    )
    got = msm8.unpack_jac_point8(curve, acc)
    assert got == _host_msm(curve, flood_scalars, pts)
