"""Differential tests: native C BW6-761 pairing (csrc bw6_miller_product)
vs the pure-Python host oracle, plus bilinearity/negative gates and the
Groth16 verify fast path."""

import random

import pytest

from zecale_tpu.ec import host_curve as hc
from zecale_tpu.ff import params as P
from zecale_tpu.native import ec as nec

pytestmark = pytest.mark.skipif(
    not nec.available(), reason="native toolchain unavailable"
)


def _points(rng):
    g1, g2 = hc.generators("bw6-761")
    c1, c2 = hc.g1_curve("bw6-761"), hc.g2_curve("bw6-761")
    r = P.CURVES["bw6-761"].r
    a, b = rng.randrange(1, r), rng.randrange(1, r)
    return c1, c2, c1.mul(a, g1), c2.mul(b, g2), a, b


def test_native_pairing_matches_host_oracle():
    from zecale_tpu.native.pairing import bw6
    from zecale_tpu.pairing import host_pairing as hp

    rng = random.Random(3)
    c1, c2, P1, Q1, _, _ = _points(rng)
    np_ = bw6()
    hctx = hp.ctx("bw6-761")
    assert np_.pairing_product([(P1, Q1)]) == hctx.pairing_product(
        [(P1, Q1)]
    )
    # product of two pairs
    P2 = c1.dbl(P1)
    pairs = [(P1, Q1), (P2, Q1)]
    assert np_.pairing_product(pairs) == hctx.pairing_product(pairs)


def test_native_pairing_bilinearity_and_negative():
    from zecale_tpu.native.pairing import bw6

    rng = random.Random(7)
    c1, c2, P1, Q1, _, _ = _points(rng)
    np_ = bw6()
    assert np_.pairing_product_is_one([(P1, Q1), (c1.neg(P1), Q1)])
    # e(2P, Q) * e(-P, Q)^2 == 1
    assert np_.pairing_product_is_one(
        [(c1.dbl(P1), Q1), (c1.neg(P1), Q1), (c1.neg(P1), Q1)]
    )
    assert not np_.pairing_product_is_one([(P1, Q1)])
    # infinity operands contribute 1
    assert np_.pairing_product_is_one([(None, Q1), (P1, None)])


def test_groth16_verify_uses_fast_path():
    """End-to-end: verify a real BW6 proof through Groth16.verify (which
    routes through the native pairing) and via the host-oracle context —
    identical verdicts."""
    from zecale_tpu.aggregator.dummy_app import dummy_app_r1cs
    from zecale_tpu.snark.groth16 import Groth16
    from zecale_tpu.snark.groth16_native import Groth16Native

    rng = random.Random(1)
    nat = Groth16Native("bw6-761")
    r1cs = dummy_app_r1cs("bw6-761")
    kp = nat.generate_setup(r1cs, rng)
    r = nat.r
    a = 7
    proof = nat.prove(r1cs, kp.pk, [1, a, pow(a, r - 2, r)], rng)
    host = Groth16("bw6-761")
    assert host.verify([a], proof, kp.vk)
    assert not host.verify([a + 1], proof, kp.vk)
    # oracle agreement on the same pairing product
    g2_gen = P.gamma_g2("bw6-761")
    acc = host.g1.add(kp.vk.abc[0], host.g1.mul(a, kp.vk.abc[1]))
    pairs = [
        (proof.a, proof.b),
        (host.g1.neg(kp.vk.alpha), kp.vk.beta),
        (host.g1.neg(acc), g2_gen),
        (host.g1.neg(proof.c), kp.vk.delta),
    ]
    assert host.ctx.pairing_product_is_one(pairs)


def test_native_bls12_pairing_matches_host():
    """BLS12-377 native Tate pairing (towered sextic Fq12 = Fq2[w]^6-u,
    csrc bls_miller_product + tow_pow) == the host oracle, plus the
    bilinearity and negative gates.  Kills the Python-oracle verify path
    for nested proofs (round-2 KNOWN_GAPS #7)."""
    import random

    from zecale_tpu.ec import host_curve as hc
    from zecale_tpu.ff import params as P
    from zecale_tpu.native import pairing as npair
    from zecale_tpu.pairing import host_pairing as hp

    eng = npair.bls12()
    if eng is None:
        import pytest

        pytest.skip("native engine unavailable")
    ctx = hp.ctx("bls12-377")
    g1g, g2g = hc.generators("bls12-377")
    crv1 = hc.g1_curve("bls12-377")
    crv2 = hc.g2_curve("bls12-377")
    rng = random.Random(4)
    r = P.CURVES["bls12-377"].r
    pairs = [
        (
            crv1.mul(rng.randrange(1, r), g1g),
            crv2.mul(rng.randrange(1, r), g2g),
        )
        for _ in range(3)
    ]
    assert eng.pairing_product(pairs) == ctx.pairing_product(pairs)
    a, b = rng.randrange(1, r), rng.randrange(1, r)
    p1 = crv1.mul(a, g1g)
    q1 = crv2.mul(b, g2g)
    p2 = crv1.neg(crv1.mul(a * b % r, g1g))
    assert eng.pairing_product_is_one([(p1, q1), (p2, g2g)])
    assert not eng.pairing_product_is_one([(p1, q1), (p2, q1)])
    # infinity pairs are skipped (contribute the identity)
    assert eng.pairing_product_is_one([(None, q1), (p1, None)])


def test_groth16_bls_verify_routes_native():
    """Groth16('bls12-377').verify runs on the native pairing and stays
    correct (fresh prove/verify round trip + corrupted-input reject)."""
    import random

    from zecale_tpu.aggregator import dummy_app as da
    from zecale_tpu.snark.groth16 import Groth16

    r1cs, kp = da.dummy_app_setup("bls12-377", random.Random(2))
    p = da.dummy_app_prove("bls12-377", kp, 11)
    g = Groth16("bls12-377")
    assert g.verify(p.inputs, p.proof, kp.vk)
    assert not g.verify([12], p.proof, kp.vk)


@pytest.mark.parametrize("curve", ["mnt4-298", "mnt6-298"])
def test_native_mnt_pairing_matches_host(curve):
    """MNT Tate pairings on the generic dense-line C engine == the host
    oracle (the MNT towers are direct binomials over Fq via w^2 = u/v;
    line placements derived numerically from the untwist map)."""
    import random

    from zecale_tpu.ec import host_curve as hc
    from zecale_tpu.ff import params as P
    from zecale_tpu.native import pairing as npair
    from zecale_tpu.pairing import host_pairing as hp

    eng = npair.generic(curve)
    if eng is None:
        pytest.skip("native engine unavailable")
    ctx = hp.ctx(curve)
    g1g, g2g = hc.generators(curve)
    crv1, crv2 = hc.g1_curve(curve), hc.g2_curve(curve)
    rng = random.Random(4)
    r = P.CURVES[curve].r
    pairs = [
        (
            crv1.mul(rng.randrange(1, r), g1g),
            crv2.mul(rng.randrange(1, r), g2g),
        )
        for _ in range(2)
    ]
    assert eng.pairing_product(pairs) == ctx.pairing_product(pairs)
    a, b = rng.randrange(1, r), rng.randrange(1, r)
    p1, q1 = crv1.mul(a, g1g), crv2.mul(b, g2g)
    p2 = crv1.neg(crv1.mul(a * b % r, g1g))
    assert eng.pairing_product_is_one([(p1, q1), (p2, g2g)])
    assert not eng.pairing_product_is_one([(p1, q1), (p2, q1)])
