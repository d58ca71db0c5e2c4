"""Evaluation domains beyond the field's 2-adicity (libfqfft
extended_radix2_domain parity — reference dependency at
/root/reference/libzecale/CMakeLists.txt:48; the load-bearing consumer is
the MNT6-298 wrapper over nested PGHR13, whose QAP degree 2^18 exceeds
Fr's 2-adicity 17: aggregator_dummy_test.cpp:225-228)."""

import random

import pytest

from zecale_tpu.ff import params as P
from zecale_tpu.poly.domain_host import (
    ExtendedRadix2Domain,
    Radix2Domain,
    domain,
    two_adicity,
)

# a small prime for cheap pure-Python coverage: 97 - 1 = 2^5 * 3
SMALL_R = 97
MNT6_R = P.CURVES["mnt6-298"].r


def _naive_evals(d, coeffs):
    r = d.r
    out = []
    for i in range(d.size):
        x = d.element(i)
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % r
        out.append(acc)
    return out


@pytest.mark.parametrize("size,small_m", [(16, 8), (32, 8), (64, 16)])
def test_extended_fft_matches_naive_evaluation(size, small_m):
    d = ExtendedRadix2Domain(size, SMALL_R, small_m=small_m)
    rng = random.Random(size)
    coeffs = [rng.randrange(SMALL_R) for _ in range(size)]
    assert d.fft(coeffs) == _naive_evals(d, coeffs)


@pytest.mark.parametrize("size,small_m", [(16, 8), (64, 16)])
def test_extended_ifft_roundtrip(size, small_m):
    d = ExtendedRadix2Domain(size, SMALL_R, small_m=small_m)
    rng = random.Random(7 * size)
    coeffs = [rng.randrange(SMALL_R) for _ in range(size)]
    assert d.ifft(d.fft(coeffs)) == coeffs
    evals = [rng.randrange(SMALL_R) for _ in range(size)]
    assert d.fft(d.ifft(evals)) == evals


def test_extended_domain_points_distinct_and_vanishing():
    d = ExtendedRadix2Domain(32, SMALL_R, small_m=8)
    pts = [d.element(i) for i in range(d.size)]
    assert len(set(pts)) == d.size
    for x in pts:
        assert d.vanishing_at(x) == 0
    # Z(x) != 0 off the domain (on the evaluation coset)
    for x in pts:
        assert d.vanishing_at(d.coset_shift * x % SMALL_R) != 0


def test_extended_coset_fft_and_divide_by_z():
    d = ExtendedRadix2Domain(16, SMALL_R, small_m=8)
    r = SMALL_R
    rng = random.Random(3)
    coeffs = [rng.randrange(r) for _ in range(16)]
    cs = d.coset_fft(coeffs)
    # coset evaluations are at coset_shift * element(i)
    for i in range(d.size):
        x = d.coset_shift * d.element(i) % r
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % r
        assert cs[i] == acc
    assert d.coset_ifft(cs) == coeffs
    # divide_by_z_on_coset: multiply back by Z at each coset point
    divided = d.divide_by_z_on_coset(cs)
    for i in range(d.size):
        x = d.coset_shift * d.element(i) % r
        assert divided[i] * d.vanishing_at(x) % r == cs[i]


def test_extended_z_coefficients():
    d = ExtendedRadix2Domain(32, SMALL_R, small_m=8)
    r = SMALL_R
    rng = random.Random(5)
    for _ in range(8):
        x = rng.randrange(r)
        acc = 0
        for e, c in d.z_coefficients():
            acc = (acc + c * pow(x, e, r)) % r
        assert acc == d.vanishing_at(x)


def test_extended_lagrange_interpolates():
    d = ExtendedRadix2Domain(16, SMALL_R, small_m=8)
    r = SMALL_R
    rng = random.Random(11)
    coeffs = [rng.randrange(r) for _ in range(16)]
    evals = d.fft(coeffs)
    tau = rng.randrange(r)
    lag = d.lagrange_at(tau)
    interp = sum(l * v for l, v in zip(lag, evals)) % r
    direct = 0
    for c in reversed(coeffs):
        direct = (direct * tau + c) % r
    assert interp == direct
    # tau on the domain -> delta vector
    lag2 = d.lagrange_at(d.element(5))
    assert lag2[5] == 1 and sum(lag2) == 1


def test_dispatch_uses_extended_above_adicity():
    s = two_adicity(MNT6_R)
    assert s == 17  # MNT6-298 Fr (the reference MNT wrapper curve)
    assert isinstance(domain(1 << s, MNT6_R), Radix2Domain)
    d = domain(1 << (s + 1), MNT6_R)
    assert isinstance(d, ExtendedRadix2Domain)
    assert d.C == 2 and d.m == 1 << s  # libfqfft extended_radix2 shape


def test_extended_domain_mnt6_small_roundtrip():
    """MNT6 Fr coefficients through a small extended domain (C == 4)."""
    d = ExtendedRadix2Domain(64, MNT6_R, small_m=16)
    rng = random.Random(13)
    coeffs = [rng.randrange(MNT6_R) for _ in range(64)]
    ev = d.fft(coeffs)
    assert ev == _naive_evals(d, coeffs)
    assert d.ifft(ev) == coeffs


def test_native_fft_matches_host_extended():
    """The C-engine fold-scale composition (groth16_native._native_fft)
    agrees with the pure-Python extended domain on MNT6 Fr."""
    from zecale_tpu.native import ec as nec

    if not nec.available():
        pytest.skip("native toolchain unavailable")
    from zecale_tpu.snark.groth16_native import _native_fft

    r = MNT6_R
    d = ExtendedRadix2Domain(64, r, small_m=32)
    F = nec.NativeScalarField(r)
    rng = random.Random(17)
    coeffs = [rng.randrange(r) for _ in range(64)]
    a = F.to_mont(coeffs)
    _native_fft(F, d, a, inverse=False)
    assert F.from_mont(a) == d.fft(coeffs)
    _native_fft(F, d, a, inverse=True)
    assert F.from_mont(a) == coeffs


def test_groth16_native_prove_verify_on_extended_domain():
    """Full Groth16 setup/prove/verify through an extended QAP domain,
    forced via the domain_host._override test hook so a 64-row circuit
    exercises the same code path as a >2^17-constraint MNT6 wrapper."""
    from zecale_tpu.native import ec as nec

    if not nec.available():
        pytest.skip("native toolchain unavailable")
    import zecale_tpu.poly.domain_host as dh
    from zecale_tpu.snark.groth16_native import Groth16Native
    from zecale_tpu.snark.r1cs import R1CS

    r = MNT6_R
    rng = random.Random(23)
    # x * y == z, plus padding constraints x*1 == x to inflate the domain
    cs = R1CS(r=r, num_primary=1, num_aux=2)
    cs.add_constraint([(2, 1)], [(3, 1)], [(1, 1)])
    for _ in range(40):
        cs.add_constraint([(2, 1)], [(0, 1)], [(2, 1)])
    x, y = rng.randrange(r), rng.randrange(r)
    assignment = [1, x * y % r, x, y]
    assert cs.is_satisfied(assignment)

    n = cs.qap_degree
    assert n == 64
    dh._override[(n, r)] = ExtendedRadix2Domain(n, r, small_m=16)
    try:
        prover = Groth16Native("mnt6-298")
        kp = prover.generate_setup(cs, rng)
        proof = prover.prove(cs, kp.pk, assignment, rng)
        assert prover.verify([assignment[1]], proof, kp.vk)
        assert not prover.verify([(assignment[1] + 1) % r], proof, kp.vk)
    finally:
        dh._override.clear()
