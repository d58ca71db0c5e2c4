"""Differential tests: JAX/TPU kernels vs the exact host oracle.

These run on the CPU backend (conftest forces JAX_PLATFORMS=cpu); the same
code paths run unchanged on TPU hardware in bench.py.
"""

import random

import pytest

from zecale_tpu.ec import host_curve as hc
from zecale_tpu.ff import params as P

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.mark.parametrize(
    "p",
    [P.BLS12_377_R, P.BLS12_377_Q, P.BW6_761_Q],
    ids=["fr-bls", "fq-bls", "fq-bw6"],
)
@pytest.mark.slow
def test_fp_ops_match_host(p):
    from zecale_tpu.ff import fp_jax

    F = fp_jax.field(p)
    rng = random.Random(11)
    N = 8
    xs = [rng.randrange(p) for _ in range(N)]
    ys = [rng.randrange(p) for _ in range(N)]
    xs[0], ys[0] = 0, p - 1  # edge values
    ax, ay = F.pack(xs), F.pack(ys)
    assert F.unpack(F.mont_mul(ax, ay)) == [x * y % p for x, y in zip(xs, ys)]
    assert F.unpack(F.add(ax, ay)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert F.unpack(F.sub(ax, ay)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert F.unpack(F.neg(ax)) == [(-x) % p for x in xs]


@pytest.mark.slow
def test_fp_inv_matches_host():
    from zecale_tpu.ff import fp_jax

    p = P.BLS12_377_R
    F = fp_jax.field(p)
    rng = random.Random(12)
    xs = [rng.randrange(1, p) for _ in range(8)]
    assert F.unpack(F.inv(F.pack(xs))) == [pow(x, p - 2, p) for x in xs]


def test_fp_smoke():
    """One small-field smoke test stays in the fast suite."""
    from zecale_tpu.ff import fp_jax

    p = P.BLS12_377_R
    F = fp_jax.field(p)
    xs = [5, 7]
    assert F.unpack(F.mont_mul(F.pack(xs), F.pack(xs))) == [25, 49]


@pytest.mark.slow
def test_fp2_mul_matches_host():
    from zecale_tpu.ff import fp2_jax, host_field as hf

    F2 = fp2_jax.bls12_377_fq2()
    H2 = hf.towers("bls12-377")["fq2"]
    rng = random.Random(13)
    a = [H2.rand(rng) for _ in range(4)]
    b = [H2.rand(rng) for _ in range(4)]
    got = F2.unpack(F2.mont_mul(F2.pack(a), F2.pack(b)))
    assert got == [H2.mul(x, y) for x, y in zip(a, b)]


@pytest.mark.parametrize("curve", ["bls12-377", "bw6-761"])
@pytest.mark.slow
def test_jacobian_ops_match_host(curve):
    from zecale_tpu.ec import msm_tpu

    crv_h = hc.g1_curve(curve)
    crv_t = msm_tpu.g1_curve_tpu(curve)
    rng = random.Random(14)
    gen = hc.generators(curve)[0]
    pts = [crv_h.mul(rng.randrange(1, crv_h.order), gen) for _ in range(4)]
    dev = msm_tpu.pack_g1_points(curve, pts)
    half = {k: v[:2] for k, v in dev.items()}
    other = {k: v[2:] for k, v in dev.items()}
    s = crv_t.add(half, other)
    expect = [crv_h.add(pts[0], pts[2]), crv_h.add(pts[1], pts[3])]
    got = [
        msm_tpu.unpack_g1_point(curve, {k: v[i] for k, v in s.items()})
        for i in range(2)
    ]
    assert got == expect
    d = crv_t.dbl(dev)
    got_d = msm_tpu.unpack_g1_point(curve, {k: v[0] for k, v in d.items()})
    assert got_d == crv_h.dbl(pts[0])
    # doubling case through the unified add
    same = crv_t.add(half, half)
    got_s = msm_tpu.unpack_g1_point(curve, {k: v[0] for k, v in same.items()})
    assert got_s == crv_h.dbl(pts[0])


@pytest.mark.slow
def test_msm_matches_host():
    from zecale_tpu.ec import msm_tpu

    curve = "bls12-377"
    crv = hc.g1_curve(curve)
    rng = random.Random(15)
    gen = hc.generators(curve)[0]
    N = 8
    pts = [crv.mul(rng.randrange(1, crv.order), gen) for _ in range(N)]
    scalars = [rng.randrange(crv.order) for _ in range(N)]
    scalars[3] = 0
    pts[5] = None
    got = msm_tpu.msm_g1(curve, scalars, pts)
    expect = crv.msm(scalars, pts)
    assert crv.eq(got, expect)


@pytest.mark.parametrize("n", [16, 64])
@pytest.mark.slow
def test_fft_matches_host(n):
    from zecale_tpu.ff import fp_jax
    from zecale_tpu.poly import fft_tpu
    from zecale_tpu.poly.domain_host import domain

    r = P.BLS12_377_R
    F = fp_jax.field(r)
    d = domain(n, r)
    rng = random.Random(16)
    coeffs = [rng.randrange(r) for _ in range(n)]
    dev = F.pack(coeffs)
    assert F.unpack(fft_tpu.fft(dev, r)) == d.fft(coeffs)
    assert F.unpack(fft_tpu.fft(dev, r, inverse=True)) == d.ifft(coeffs)
    assert F.unpack(fft_tpu.coset_fft(dev, r)) == d.coset_fft(coeffs)
    assert F.unpack(fft_tpu.coset_ifft(dev, r)) == d.coset_ifft(coeffs)


@pytest.mark.slow
def test_groth16_tpu_prove_verify_dummy_app():
    """Full TPU-path Groth16 (setup + prove) on the dummy app circuit,
    verified by the exact host verifier."""
    from zecale_tpu.aggregator import dummy_app as da
    from zecale_tpu.snark.groth16 import Groth16
    from zecale_tpu.snark.groth16_tpu import Groth16TPU

    curve = "bls12-377"
    r1cs = da.dummy_app_r1cs(curve)
    tpu = Groth16TPU(curve)
    kp = tpu.generate_setup(r1cs, random.Random(21))
    asg = da.dummy_app_assignment(curve, 7)
    assert r1cs.is_satisfied(asg)
    proof = tpu.prove(r1cs, kp.pk, asg, random.Random(22))
    host = Groth16(curve)
    assert host.verify([7], proof, kp.vk)
    assert not host.verify([8], proof, kp.vk)


@pytest.mark.slow
def test_pghr13_tpu_prove_verify_dummy_app():
    """Full TPU-path PGHR13 (setup + prove) on the dummy app circuit,
    verified by the exact host verifier (mirrors the Groth16 test above;
    reference capability: ZECALE_SNARK=PGHR13 builds)."""
    from zecale_tpu.aggregator import dummy_app as da
    from zecale_tpu.snark.pghr13 import Pghr13
    from zecale_tpu.snark.pghr13_tpu import Pghr13TPU

    curve = "bls12-377"
    r1cs = da.dummy_app_r1cs(curve)
    tpu = Pghr13TPU(curve)
    kp = tpu.generate_setup(r1cs, random.Random(31))
    asg = da.dummy_app_assignment(curve, 9)
    assert r1cs.is_satisfied(asg)
    proof = tpu.prove(r1cs, kp.pk, asg, random.Random(32))
    host = Pghr13(curve)
    assert host.verify([9], proof, kp.vk)
    assert not host.verify([10], proof, kp.vk)


@pytest.mark.slow
def test_msm_pippenger_matches_host_large():
    """Pippenger differential vs host oracle at n > 512 so the tiled
    segmented-scan reduce rounds (incl. the mixed-coordinate first round)
    are exercised, with duplicate points (in-bucket doubling case),
    infinity points, zero scalars and non-tile-aligned length."""
    from zecale_tpu.ec import msm_tpu

    curve = "bls12-377"
    crv = hc.g1_curve(curve)
    rng = random.Random(44)
    gen = hc.generators(curve)[0]
    base = [crv.mul(rng.randrange(1, crv.order), gen) for _ in range(16)]
    N = 1037  # not a multiple of the tile size -> padding path
    pts = [base[i % 16] for i in range(N)]  # heavy duplication
    scalars = [rng.randrange(crv.order) for _ in range(N)]
    scalars[7] = 0
    scalars[8] = 0
    pts[9] = None
    # force equal digits on equal points in at least one window
    scalars[20] = scalars[36]  # pts[20] != pts[36]
    scalars[16] = scalars[32]  # pts[16] == pts[32] (same base mod 16)
    got = msm_tpu.msm_g1_pippenger(curve, scalars, pts)
    expect = crv.msm(scalars, pts)
    assert crv.eq(got, expect)
