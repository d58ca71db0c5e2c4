"""Differential tests for the lazy ("quick") Montgomery layer (ff/fp8q.py)
against the exact host bigint model — the round-4 kernel arithmetic core.

Mirrors the reference's field-correctness surface (libff Fp tests, SURVEY
section 2b) at the relaxed-representation level: every op must preserve the
value mod p AND respect its static k*p bound.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zecale_tpu.ff import fp8, fp8q, fp8t
from zecale_tpu.ff import params as P

MODULI = [
    ("bls-q", P.BLS12_377_Q),
    ("bw6-q", P.BW6_761_Q),
]


def test_low_headroom_field_rejected():
    """Scalar fields without >= 7 headroom bits must be refused."""
    F = fp8.field8(P.BLS12_377_R)
    with pytest.raises(AssertionError):
        fp8q.make_qconsts(F)


def _vals_t(F, rng, n, kmax=1):
    """Random values < kmax*p as (L, n) transposed canonical limbs."""
    vals = [rng.randrange(kmax * F.p) for _ in range(n)]
    arr = jnp.asarray(fp8.batch_to_limbs8(vals, F.L)).T
    return vals, arr


def _ints_t(F, arr):
    return fp8.batch_from_limbs8(np.asarray(arr).T)


@pytest.mark.parametrize("name,p", MODULI)
def test_lazy_ops_value_and_bound(name, p):
    rng = random.Random(1)
    F = fp8.field8(p)
    tc = dict(F.tc)
    tc.update(fp8q.make_qconsts(F))
    n = 64
    av, a = _vals_t(F, rng, n, kmax=4)
    bv, b = _vals_t(F, rng, n, kmax=4)

    s = _ints_t(F, fp8q.add_q(a, b))
    assert s == [x + y for x, y in zip(av, bv)]

    d = _ints_t(F, fp8q.sub_q(a, b, 4, tc))
    assert all(
        (x - y) % p == z % p and 0 <= z < 8 * p
        for x, y, z in zip(av, bv, d)
    )

    t = _ints_t(F, fp8q.triple_q(a))
    assert t == [3 * x for x in av]

    ng = _ints_t(F, fp8q.neg_q(a, 4, tc))
    assert all(
        (-x) % p == z % p and 0 <= z < 4 * p for x, z in zip(av, ng)
    )

    rh = _ints_t(F, fp8q.reduce_half_q(a, 4, tc))
    assert all(x % p == z % p and z < 2 * p for x, z in zip(av, rh))

    # mont_mul_q: value correct mod p, bound < 2p; inputs up to 8p * 8p
    av8, a8 = _vals_t(F, rng, n, kmax=8)
    bv8, b8 = _vals_t(F, rng, n, kmax=8)
    R = 1 << (8 * F.L)
    m = _ints_t(F, fp8q.mont_mul_q(a8, b8, tc))
    rinv = pow(R, p - 2, p)
    assert all(
        z % p == x * y * rinv % p and z < 2 * p
        for x, y, z in zip(av8, bv8, m)
    )

    c = _ints_t(F, fp8q.canon_q(a, 4, tc))
    assert all(z == x % p for x, z in zip(av, c))


@pytest.mark.parametrize("name,p", MODULI)
def test_fused_redc_matches_two_muls(name, p):
    rng = random.Random(2)
    F = fp8.field8(p)
    tc = dict(F.tc)
    tc.update(fp8q.make_qconsts(F))
    Q = fp8q.QOps(tc)
    n = 32
    vals = [_vals_t(F, rng, n, kmax=4) for _ in range(4)]
    (av, a), (bv, b), (cv, c), (dv, d) = vals
    out = _ints_t(
        F,
        fp8q.redc_q(fp8t.conv_ab_t(a, b, tc) + fp8t.conv_ab_t(c, d, tc), tc),
    )
    R = 1 << (8 * F.L)
    rinv = pow(R, p - 2, p)
    assert all(
        z % p == (x * y + u * v) * rinv % p
        for x, y, u, v, z in zip(av, bv, cv, dv, out)
    )
    assert Q is not None


def _host_proj(curve_name):
    from zecale_tpu.ec import host_curve as hc

    return hc.g1_curve(curve_name)


@pytest.mark.parametrize("curve,b3", [("bls12-377", 3), ("bw6-761", -3)])
def test_lazy_rcb_group_law_matches_host(curve, b3):
    """proj_add_q / proj_dbl_q on random points + identity + doubling
    operands agree with the host affine law after normalization."""
    from zecale_tpu.ec import host_curve as hc

    cp = P.CURVES[curve]
    F = fp8.field8(cp.q)
    tc = dict(F.tc)
    tc.update(fp8q.make_qconsts(F))
    Q = fp8q.QOps(tc)
    crv_h = hc.g1_curve(curve)
    gen = hc.generators(curve)[0]

    # build test points: k*G for k in 1..6, plus identity
    pts = []
    pt = gen
    for _ in range(6):
        pts.append(pt)
        pt = crv_h.dbl(pt)

    def pack_proj(points):
        """affine host points (or None) -> transposed (L, n) coord dicts
        in Montgomery projective form."""
        xs = [0 if q is None else q[0] for q in points]
        ys = [1 if q is None else q[1] for q in points]
        zs = [0 if q is None else 1 for q in points]
        pk = lambda vs: jnp.asarray(
            np.asarray(F.pack(vs, mont=True))
        ).T
        return {"x": pk(xs), "y": pk(ys), "z": pk(zs)}

    def unpack_proj(pd):
        fq = crv_h.F
        xs = _ints_t(F, pd["x"])
        ys = _ints_t(F, pd["y"])
        zs = _ints_t(F, pd["z"])
        R = 1 << (8 * F.L)
        rinv = pow(R, cp.q - 2, cp.q)
        out = []
        for x, y, z in zip(xs, ys, zs):
            x, y, z = (v * rinv % cp.q for v in (x, y, z))
            if z == 0:
                out.append(None)
            else:
                zi = fq.inv(z)
                out.append((fq.mul(x, zi), fq.mul(y, zi)))
        return out

    P1 = pack_proj([pts[0], pts[1], None, pts[2], pts[3]])
    P2 = pack_proj([pts[1], pts[1], pts[4], None, crv_h.neg(pts[3])])
    got = unpack_proj(fp8q.proj_add_q(Q, P1, P2, b3))
    exp = [
        crv_h.add(pts[0], pts[1]),
        crv_h.dbl(pts[1]),
        pts[4],
        pts[2],
        None,
    ]
    assert got == exp

    gd = unpack_proj(fp8q.proj_dbl_q(Q, P1, b3))
    expd = [crv_h.dbl(q) if q else None for q in
            [pts[0], pts[1], None, pts[2], pts[3]]]
    assert gd == expd

    # iterate the law to confirm the k<=4 fixed point doesn't drift
    acc = P1
    for _ in range(4):
        acc = fp8q.proj_add_q(Q, acc, P2, b3)
        acc = fp8q.proj_dbl_q(Q, acc, b3)
    ref = [pts[0], pts[1], None, pts[2], pts[3]]
    ref2 = [pts[1], pts[1], pts[4], None, crv_h.neg(pts[3])]
    refacc = []
    for u, v in zip(ref, ref2):
        w = u
        for _ in range(4):
            w = crv_h.add(w, v) if v and w else (v if not w else w)
            w = crv_h.dbl(w) if w else None
        refacc.append(w)
    assert unpack_proj(acc) == refacc


def test_lazy_rcb_fq2_group_law():
    """BLS12-377 G2 (Fq2 coords, constant b3) lazy law vs host G2."""
    from zecale_tpu.ec import host_curve as hc
    from zecale_tpu.ec.msm8 import Fp28TPU

    cp = P.CURVES["bls12-377"]
    F2 = Fp28TPU(cp.q, P.BLS12_377_FQ2_QNR)
    F = F2.base
    tc = dict(F.tc)
    tc.update(fp8q.make_qconsts(F))
    L = F.L
    R = 1 << (8 * L)
    nr_t = jnp.asarray(
        fp8.to_limbs8(P.BLS12_377_FQ2_QNR * R % cp.q, L).reshape(L, 1)
    )
    Q = fp8q.QOps2(tc, nr_t)
    c1 = (-3 * pow(5, cp.q - 2, cp.q)) % cp.q
    b3 = jnp.asarray(
        np.concatenate(
            [fp8.to_limbs8(0, L), fp8.to_limbs8(c1 * R % cp.q, L)]
        )
    )

    crv_h = hc.g2_curve("bls12-377")
    gen = hc.generators("bls12-377")[1]
    pts = []
    pt = gen
    for _ in range(4):
        pts.append(pt)
        pt = crv_h.dbl(pt)

    def pack2(points):
        def pkc(cs):
            return jnp.asarray(np.asarray(F.pack(cs, mont=True))).T

        def coords(sel, default):
            c0 = [default[0] if q is None else q[sel][0] for q in points]
            c1v = [default[1] if q is None else q[sel][1] for q in points]
            return jnp.concatenate([pkc(c0), pkc(c1v)], axis=0)

        zs = jnp.concatenate(
            [
                pkc([0 if q is None else 1 for q in points]),
                pkc([0] * len(points)),
            ],
            axis=0,
        )
        return {
            "x": coords(0, (0, 0)),
            "y": coords(1, (1, 0)),
            "z": zs,
        }

    def unpack2(pd):
        fq2 = crv_h.F
        rinv = pow(R, cp.q - 2, cp.q)

        def coords(a):
            c0 = _ints_t(F, a[:L])
            c1v = _ints_t(F, a[L:])
            return [
                (x * rinv % cp.q, y * rinv % cp.q)
                for x, y in zip(c0, c1v)
            ]

        out = []
        for x, y, z in zip(coords(pd["x"]), coords(pd["y"]),
                           coords(pd["z"])):
            if z == (0, 0):
                out.append(None)
            else:
                zi = fq2.inv(z)
                out.append((fq2.mul(x, zi), fq2.mul(y, zi)))
        return out

    P1 = pack2([pts[0], pts[1], None])
    P2 = pack2([pts[1], pts[1], pts[2]])
    got = unpack2(fp8q.proj_add_q(Q, P1, P2, b3))
    assert got == [
        crv_h.add(pts[0], pts[1]),
        crv_h.dbl(pts[1]),
        pts[2],
    ]
    gd = unpack2(fp8q.proj_dbl_q(Q, P1, b3))
    assert gd == [crv_h.dbl(pts[0]), crv_h.dbl(pts[1]), None]
