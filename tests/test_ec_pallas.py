"""Differential tests: fused Pallas group-law kernels (ec/ec_pallas.py,
interpreter mode on CPU) vs the jnp JacCurve over the same fp8 field."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zecale_tpu.ec import ec_pallas, host_curve as hc, msm8
from zecale_tpu.ff import fp8
from zecale_tpu.ff import params as P

CURVE = "bls12-377"


def _host_pts(n, rng, curve=CURVE):
    crv = hc.g1_curve(curve)
    gen = hc.generators(curve)[0]
    pts, p = [], gen
    for _ in range(n):
        pts.append(p)
        p = crv.add(crv.dbl(p), gen)
    rng.shuffle(pts)
    return pts


def _pack_jac(curve, pts):
    """Host affine -> device Jacobian (z=1 / infinity)."""
    F = fp8.field8(P.CURVES[curve].q)
    aff = msm8.pack_points_affine8(curve, pts)
    one = F.one_mont_elem()
    z = jnp.where(
        aff["inf"][:, None], jnp.zeros_like(aff["x"]),
        jnp.broadcast_to(one, aff["x"].shape),
    )
    return {"x": aff["x"], "y": aff["y"], "z": z}


def _unpack_all(curve, jac):
    return [
        msm8.unpack_jac_point8(
            curve, {k: v[i] for k, v in jac.items()}
        )
        for i in range(jac["x"].shape[0])
    ]


@pytest.fixture(scope="module")
def pcrv():
    return ec_pallas.PallasG1Curve(CURVE, bt=8)


def test_pallas_jac_add_differential(pcrv):
    rng = random.Random(0)
    n = 12
    pts_a = _host_pts(n, rng)
    pts_b = _host_pts(n, rng)
    # special cases: equal, inverse, infinities
    crv_h = hc.g1_curve(CURVE)
    pts_b[0] = pts_a[0]                      # doubling
    pts_b[1] = (pts_a[1][0], crv_h.F.neg(pts_a[1][1]))  # inverse
    pts_a[2] = None                          # inf + Q
    pts_b[3] = None                          # P + inf
    pts_a[4] = None
    pts_b[4] = None                          # inf + inf
    ja = _pack_jac(CURVE, pts_a)
    jb = _pack_jac(CURVE, pts_b)
    got = _unpack_all(CURVE, pcrv.add(ja, jb))
    expect = [crv_h.add(a, b) for a, b in zip(pts_a, pts_b)]
    assert got == expect


def test_pallas_jac_dbl_differential(pcrv):
    rng = random.Random(1)
    pts = _host_pts(7, rng)
    pts[3] = None
    crv_h = hc.g1_curve(CURVE)
    got = _unpack_all(CURVE, pcrv.dbl(_pack_jac(CURVE, pts)))
    expect = [crv_h.dbl(p) for p in pts]
    assert got == expect


def test_pallas_dbl_chain_differential(pcrv):
    """Fused k-doubling chain kernel == k host doublings (incl. k=0 and
    infinity lanes)."""
    rng = random.Random(9)
    pts = _host_pts(5, rng)
    pts[2] = None
    crv_h = hc.g1_curve(CURVE)
    packed = _pack_jac(CURVE, pts)
    assert _unpack_all(CURVE, pcrv.dbl_chain(packed, 0)) == pts
    for k in (1, 6):
        got = _unpack_all(CURVE, pcrv.dbl_chain(packed, k))
        expect = list(pts)
        for _ in range(k):
            expect = [crv_h.dbl(p) for p in expect]
        assert got == expect


def test_pallas_aff_add_differential(pcrv):
    rng = random.Random(2)
    n = 10
    pts_a = _host_pts(n, rng)
    pts_b = _host_pts(n, rng)
    crv_h = hc.g1_curve(CURVE)
    pts_b[0] = pts_a[0]
    pts_b[1] = (pts_a[1][0], crv_h.F.neg(pts_a[1][1]))
    pts_a[2] = None
    pts_b[3] = None
    a1 = msm8.pack_points_affine8(CURVE, pts_a)
    a2 = msm8.pack_points_affine8(CURVE, pts_b)
    got = _unpack_all(CURVE, pcrv.add_affine_affine(a1, a2))
    expect = [crv_h.add(a, b) for a, b in zip(pts_a, pts_b)]
    assert got == expect


def test_pallas_nonuniform_batch_pad(pcrv):
    """Batch size not a multiple of the block size exercises padding."""
    rng = random.Random(3)
    pts = _host_pts(5, rng)
    crv_h = hc.g1_curve(CURVE)
    ja = _pack_jac(CURVE, pts)
    got = _unpack_all(CURVE, pcrv.dbl(ja))
    assert got == [crv_h.dbl(p) for p in pts]


def test_pallas_g2_fq2_add_differential():
    """BLS12-377 G2 (Fq2 coordinates) through the Fq2 kernel family."""
    rng = random.Random(5)
    n = 6
    crv_h = hc.g2_curve(CURVE)
    gen = hc.generators(CURVE)[1]
    pts_a, p = [], gen
    for _ in range(n):
        pts_a.append(p)
        p = crv_h.add(crv_h.dbl(p), gen)
    pts_b = list(reversed(pts_a))
    pts_b[0] = pts_a[0]  # doubling case
    pts_a[1] = None      # infinity

    pcrv2 = ec_pallas.PallasG1Curve(CURVE, bt=8, g2=True)
    F2 = pcrv2.F
    a1 = msm8.pack_points_affine8(CURVE, pts_a, g2=True)
    a2 = msm8.pack_points_affine8(CURVE, pts_b, g2=True)
    out = pcrv2.add_affine_affine(a1, a2)
    got = [
        msm8.unpack_jac_point8(
            CURVE, {k: v[i] for k, v in out.items()}, g2=True
        )
        for i in range(n)
    ]
    expect = [crv_h.add(x, y) if x and y else (y if not x else x)
              for x, y in zip(pts_a, pts_b)]
    assert got == expect
    # and a doubling through the jac kernel
    one2 = F2.one_mont_elem()
    jac = {
        "x": a1["x"],
        "y": a1["y"],
        "z": jnp.where(
            a1["inf"][:, None, None],
            jnp.zeros_like(a1["x"]),
            jnp.broadcast_to(one2, a1["x"].shape),
        ),
    }
    out2 = pcrv2.dbl(jac)
    got2 = [
        msm8.unpack_jac_point8(
            CURVE, {k: v[i] for k, v in out2.items()}, g2=True
        )
        for i in range(n)
    ]
    assert got2 == [crv_h.dbl(x) if x else None for x in pts_a]


# ---------------------------------------------------------------------------
# complete projective (RCB) kernels
# ---------------------------------------------------------------------------


def _unpack_proj(curve, crv, pt, i, g2=False):
    F = crv.F
    one = {k: v[i] for k, v in pt.items()}
    jac = crv.to_jacobian(
        {k: v[None] for k, v in one.items()}
    )
    return msm8.unpack_jac_point8(
        curve, {k: v[0] for k, v in jac.items()}, g2=g2
    )


@pytest.mark.parametrize("curve", ["bls12-377", "bw6-761"])
def test_pallas_proj_add_differential(curve):
    """PallasProjCurve.add (RCB complete kernel) vs the host oracle,
    including equal / inverse / identity operands (completeness)."""
    rng = random.Random(3)
    n = 8
    crv_h = hc.g1_curve(curve)
    pts_a = _host_pts(n, rng, curve)
    pts_b = _host_pts(n, rng, curve)
    pts_b[0] = pts_a[0]                       # doubling case
    pts_b[1] = (pts_a[1][0], crv_h.F.neg(pts_a[1][1]))  # inverse case
    pts_a[2] = None                           # identity + finite
    pts_b[3] = None                           # finite + identity
    pts_a[4] = pts_b[4] = None                # identity + identity
    pcrv = ec_pallas.PallasProjCurve(curve, bt=8)
    pa = pcrv.from_affine(msm8.pack_points_affine8(curve, pts_a))
    pb = pcrv.from_affine(msm8.pack_points_affine8(curve, pts_b))
    out = pcrv.add(pa, pb)
    for i in range(n):
        p, q = pts_a[i], pts_b[i]
        expect = crv_h.add(p, q) if (p and q) else (p or q)
        assert _unpack_proj(curve, pcrv, out, i) == expect, i
    # doubling chain
    out2 = pcrv.dbl_chain(pa, 3)
    for i in range(n):
        e = pts_a[i]
        for _ in range(3):
            e = crv_h.dbl(e) if e else None
        assert _unpack_proj(curve, pcrv, out2, i) == e, i


def test_pallas_proj_g2_fq2_differential():
    """BLS12-377 G2 (Fq2 coords): the b3 twist constant rides as a kernel
    const — validate add + dbl_chain against the host G2 oracle."""
    curve = "bls12-377"
    rng = random.Random(9)
    crv_h = hc.g2_curve(curve)
    gen = hc.generators(curve)[1]
    pts, p = [], gen
    for _ in range(6):
        pts.append(p)
        p = crv_h.add(crv_h.dbl(p), gen)
    pts_b = pts[1:] + [None]
    pcrv = ec_pallas.PallasProjCurve(curve, bt=8, g2=True)
    pa = pcrv.from_affine(msm8.pack_points_affine8(curve, pts, g2=True))
    pb = pcrv.from_affine(msm8.pack_points_affine8(curve, pts_b, g2=True))
    out = pcrv.add(pa, pb)
    for i in range(6):
        q = pts_b[i]
        expect = crv_h.add(pts[i], q) if q else pts[i]
        assert _unpack_proj(curve, pcrv, out, i, g2=True) == expect, i
    out2 = pcrv.dbl_chain(pa, 2)
    for i in range(6):
        e = crv_h.dbl(crv_h.dbl(pts[i]))
        assert _unpack_proj(curve, pcrv, out2, i, g2=True) == e, i


def test_pallas_proj_bw6_g2_b3():
    """BW6-761 G2 shares the Fq kernel family with G1 but has b3 = 12
    (twist y^2 = x^3 + 4) — a wrong family key would silently use -3."""
    curve = "bw6-761"
    crv_h = hc.g2_curve(curve)
    gen = hc.generators(curve)[1]
    pts = [gen, crv_h.dbl(gen), crv_h.add(crv_h.dbl(gen), gen)]
    pcrv = ec_pallas.PallasProjCurve(curve, bt=8, g2=True)
    pa = pcrv.from_affine(msm8.pack_points_affine8(curve, pts, g2=True))
    out = pcrv.dbl_chain(pa, 1)
    for i in range(3):
        assert _unpack_proj(curve, pcrv, out, i, g2=True) == crv_h.dbl(
            pts[i]
        ), i
