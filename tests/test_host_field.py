"""Algebraic identities for the host field towers of all supported curves."""

import random

import pytest

from zecale_tpu.ff import host_field as hf
from zecale_tpu.ff import params as P

CURVES = ["bls12-377", "bw6-761", "mnt4-298", "mnt6-298"]


@pytest.mark.parametrize("curve", CURVES)
def test_prime_field_identities(curve):
    rng = random.Random(42)
    fq = hf.towers(curve)["fq"]
    for _ in range(20):
        a, b = fq.rand(rng), fq.rand(rng)
        assert fq.eq(fq.add(a, b), fq.add(b, a))
        assert fq.eq(fq.mul(a, b), fq.mul(b, a))
        assert fq.eq(fq.sub(fq.add(a, b), b), a)
        if not fq.is_zero(a):
            assert fq.eq(fq.mul(a, fq.inv(a)), fq.one())
        assert fq.eq(fq.sqr(a), fq.mul(a, a))


@pytest.mark.parametrize("curve", CURVES)
def test_full_tower_identities(curve):
    rng = random.Random(43)
    fqk = hf.towers(curve)["fqk"]
    assert fqk.degree == P.CURVES[curve].embedding_degree
    for _ in range(10):
        a, b, c = fqk.rand(rng), fqk.rand(rng), fqk.rand(rng)
        # distributivity
        assert fqk.eq(
            fqk.mul(a, fqk.add(b, c)), fqk.add(fqk.mul(a, b), fqk.mul(a, c))
        )
        # associativity
        assert fqk.eq(fqk.mul(fqk.mul(a, b), c), fqk.mul(a, fqk.mul(b, c)))
        # inverse
        if not fqk.is_zero(a):
            assert fqk.eq(fqk.mul(a, fqk.inv(a)), fqk.one())
        # Frobenius-order sanity: a^(q^k) == a
        # (cheap version: pow by q on a subfield-degree-1 element)
    # multiplicative order divides q^k - 1
    q = P.CURVES[curve].q
    k = fqk.degree
    a = fqk.rand(rng)
    assert fqk.eq(fqk.pow(a, q**k - 1), fqk.one())


@pytest.mark.parametrize("curve", CURVES)
def test_tower_flatten_roundtrip(curve):
    rng = random.Random(44)
    fqk = hf.towers(curve)["fqk"]
    a = fqk.rand(rng)
    flat = fqk.to_list(a)
    assert len(flat) == fqk.degree
    assert fqk.eq(fqk.from_list(flat), a)


def test_nonresidues_are_nonresidues():
    q = P.BLS12_377_Q
    assert pow(P.BLS12_377_FQ2_QNR, (q - 1) // 2, q) == q - 1
    q4 = P.MNT4_298_Q
    assert pow(P.MNT4_298_QNR, (q4 - 1) // 2, q4) == q4 - 1
    # MNT6/BW6 cubic nonresidues: x^3 - nr irreducible <=> nr not a cube
    q6 = P.MNT6_298_Q
    assert (q6 - 1) % 3 == 0
    assert pow(P.MNT6_298_QNR, (q6 - 1) // 3, q6) != 1
    qw = P.BW6_761_Q
    assert (qw - 1) % 3 == 0
    assert pow(P.BW6_761_XI, (qw - 1) // 3, qw) != 1
