"""Differential tests: 8-bit limb-plane field core (ff/fp8.py) vs Python
bignum oracle, across all moduli the framework uses.

Mirrors the reference's field test strategy (randomized differential
against a trusted model — SURVEY.md section 4.1) for the round-2 fast core.
"""

import random

import numpy as np
import pytest

from zecale_tpu.ff import fp8
from zecale_tpu.ff import params as P

MODULI = {
    "bls12-377-r": P.BLS12_377_R,
    "bls12-377-q": P.BLS12_377_Q,
    "bw6-761-q": P.BW6_761_Q,
    "mnt4-r": P.MNT4_298_R,
    "mnt6-q": P.MNT6_298_Q,
}


def _rand_elems(rng, p, n):
    xs = [rng.randrange(p) for _ in range(n - 4)]
    # boundary cases
    xs += [0, 1, p - 1, p // 2]
    return xs


@pytest.mark.parametrize("name", sorted(MODULI))
def test_fp8_ops_differential(name):
    p = MODULI[name]
    F = fp8.field8(p)
    rng = random.Random(1234)
    n = 32
    xs = _rand_elems(rng, p, n)
    ys = _rand_elems(rng, p, n)
    rng.shuffle(ys)

    ax = F.pack(xs)  # Montgomery
    ay = F.pack(ys)

    # round trip
    assert F.unpack(ax) == [x % p for x in xs]

    got_add = F.unpack(np.asarray(F.add(ax, ay)), mont=True)
    assert got_add == [(x + y) % p for x, y in zip(xs, ys)]

    got_sub = F.unpack(np.asarray(F.sub(ax, ay)), mont=True)
    assert got_sub == [(x - y) % p for x, y in zip(xs, ys)]

    got_neg = F.unpack(np.asarray(F.neg(ax)), mont=True)
    assert got_neg == [(-x) % p for x in xs]

    got_mul = F.unpack(F.mont_mul(ax, ay))
    assert got_mul == [(x * y) % p for x, y in zip(xs, ys)]

    got_sqr = F.unpack(F.mont_sqr(ax))
    assert got_sqr == [(x * x) % p for x in xs]


def test_fp8_mul_stress_bls_q():
    """Deeper randomized stress on the default curve's base field, including
    repeated multiplication chains (accumulating any non-canonical drift)."""
    p = P.BLS12_377_Q
    F = fp8.field8(p)
    rng = random.Random(99)
    n = 64
    xs = [rng.randrange(p) for _ in range(n)]
    a = F.pack(xs)
    ref = [x for x in xs]
    for _ in range(5):
        a = F.mont_mul(a, a)
        ref = [x * x % p for x in ref]
        a = F.add(a, F.one_mont_elem()[None, :].repeat(n, 0))
        ref = [(x + 1) % p for x in ref]
    assert F.unpack(a) == ref
    # canonical limb invariant
    arr = np.asarray(a)
    assert arr.min() >= 0 and arr.max() < 256


def test_fp8_inv_and_batch_inverse():
    p = P.BLS12_377_Q
    F = fp8.field8(p)
    rng = random.Random(7)
    xs = [rng.randrange(1, p) for _ in range(13)] + [0]
    a = F.pack(xs)
    got = F.unpack(F.inv(a))
    expect = [pow(x, p - 2, p) if x else 0 for x in xs]
    assert got == expect

    got_b = F.unpack(F.batch_inverse(a))
    assert got_b == expect


def test_limb_plane_converters():
    import jax.numpy as jnp

    from zecale_tpu.ff import fp_jax
    from zecale_tpu.ff import limb as lb

    p = P.BLS12_377_Q
    F16 = fp_jax.field(p)
    F8 = fp8.field8(p)
    rng = random.Random(3)
    xs = [rng.randrange(p) for _ in range(9)] + [0]
    a16 = F16.pack(xs, mont=False)
    a8 = fp8.limbs16_to_8(a16, F8.L)
    assert fp8.batch_from_limbs8(np.asarray(a8)) == [x % p for x in xs]
    back = fp8.limbs8_to_16(a8, F16.L)
    assert lb.batch_from_limbs(np.asarray(back)) == [x % p for x in xs]
