"""Group-law and pairing properties on the host path, all curves."""

import random

import pytest

from zecale_tpu.ec import host_curve as hc
from zecale_tpu.ff import params as P
from zecale_tpu.pairing import host_pairing as hp

CURVES = ["bls12-377", "bw6-761", "mnt4-298", "mnt6-298"]


@pytest.mark.parametrize("curve", CURVES)
def test_group_laws(curve):
    g1g, g2g = hc.generators(curve)
    for crv, gen in ((hc.g1_curve(curve), g1g), (hc.g2_curve(curve), g2g)):
        assert crv.is_on_curve(gen)
        assert crv.in_subgroup(gen)
        p2 = crv.dbl(gen)
        assert crv.eq(p2, crv.add(gen, gen))
        p3 = crv.add(p2, gen)
        assert crv.eq(p3, crv.mul(3, gen))
        assert crv.eq(crv.add(p3, crv.neg(gen)), p2)
        # Jacobian path agrees with affine
        j = crv.jac_add(crv.to_jacobian(p2), crv.to_jacobian(p3))
        assert crv.eq(crv.from_jacobian(j), crv.mul(5, gen))
        # order
        assert crv._mul_raw(crv.order, gen) is None


@pytest.mark.parametrize("curve", CURVES)
@pytest.mark.slow
def test_pairing_bilinearity(curve):
    ctx = hp.ctx(curve)
    g1g, g2g = hc.generators(curve)
    rng = random.Random(4711)
    a = rng.randrange(1, 2**64)
    b = rng.randrange(1, 2**64)
    e_ab = ctx.pairing(ctx.g1.mul(a, g1g), ctx.g2.mul(b, g2g))
    e_prod = ctx.pairing(ctx.g1.mul(a * b, g1g), g2g)
    assert ctx.fqk.eq(e_ab, e_prod)
    assert not ctx.fqk.eq(e_ab, ctx.fqk.one())
    # untwist sanity
    assert ctx.untwisted_on_curve(ctx.untwist(g2g))


@pytest.mark.parametrize("curve", ["bls12-377", "bw6-761"])
def test_random_subgroup_points(curve):
    rng = random.Random(5)
    crv = hc.g1_curve(curve)
    if crv.cofactor is None:
        # sample via generator instead
        g1g, _ = hc.generators(curve)
        pt = crv.mul(rng.randrange(1, crv.order), g1g)
    else:
        pt = crv.random_point(rng)
    assert crv.is_on_curve(pt)
    assert crv.in_subgroup(pt)
