"""Differential tests: in-circuit gadgets vs the host oracle."""

import random

import pytest

from zecale_tpu.ec import host_curve as hc
from zecale_tpu.ff import host_field as hf
from zecale_tpu.ff import params as P
from zecale_tpu.gadgets import curve_ops as co
from zecale_tpu.gadgets import field_ext as fe
from zecale_tpu.gadgets import mimc
from zecale_tpu.gadgets import packing
from zecale_tpu.gadgets.protoboard import LC, Protoboard

R_W = P.BW6_761_R  # wrapper scalar field == nested (BLS12-377) base field


def _finish(pb, extra=None):
    w = pb.generate_witness([0] * pb.num_primary, extra)
    r1cs = pb.to_r1cs()
    assert r1cs.is_satisfied(w), (
        f"constraint {r1cs.first_failing_constraint(w)} failed"
    )
    return w


def test_mul_div_inv_equal_bits():
    pb = Protoboard(R_W)
    rng = random.Random(1)
    a, b = rng.randrange(R_W), rng.randrange(1, R_W)
    va, vb = LC.const(a), LC.const(b)
    prod = pb.mul(va, vb)
    quot = pb.div(va, vb)
    eq1 = pb.is_equal_bit(va, va)
    eq0 = pb.is_equal_bit(va, vb)
    w = _finish(pb)
    assert pb.lc_val(w, prod) == a * b % R_W
    assert pb.lc_val(w, quot) == a * pow(b, R_W - 2, R_W) % R_W
    assert pb.lc_val(w, eq1) == 1
    assert pb.lc_val(w, eq0) == 0


def test_unpack_bits_roundtrip():
    pb = Protoboard(R_W)
    v = 0b101101
    bits = packing.unpack_bits(pb, LC.const(v), 8)
    packed = packing.pack_bits(pb, bits)
    w = _finish(pb)
    assert [pb.lc_val(w, b) for b in bits] == [1, 0, 1, 1, 0, 1, 0, 0]
    assert pb.lc_val(w, packed) == v


@pytest.mark.parametrize("level", ["fq2", "fq6", "fq12"])
def test_ext_gadget_matches_host(level):
    rng = random.Random(7)
    pb = Protoboard(R_W)
    gt = fe.gadget_towers(pb, "bls12-377")
    ht = hf.towers("bls12-377")
    G, H = gt[level], ht[level]
    a_h, b_h = H.rand(rng), H.rand(rng)
    a_g = G.constant(a_h)
    b_g = G.constant(b_h)
    prod = G.mul(a_g, b_g)
    sq = G.sqr(a_g)
    inv = G.inv(a_g)
    frob = G.frobenius(a_g, 1)
    w = _finish(pb)
    assert H.eq(G.value(w, prod), H.mul(a_h, b_h))
    assert H.eq(G.value(w, sq), H.sqr(a_h))
    assert H.eq(G.value(w, inv), H.inv(a_h))
    assert H.eq(G.value(w, frob), H.pow(a_h, P.BLS12_377_Q))


def test_ext_is_equal_bit():
    pb = Protoboard(R_W)
    gt = fe.gadget_towers(pb, "bls12-377")
    ht = hf.towers("bls12-377")
    G, H = gt["fq2"], ht["fq2"]
    a = H.rand(random.Random(3))
    bit1 = G.is_equal_bit(G.constant(a), G.constant(a))
    bit0 = G.is_equal_bit(G.constant(a), G.constant(H.add(a, H.one())))
    w = _finish(pb)
    assert pb.lc_val(w, bit1) == 1
    assert pb.lc_val(w, bit0) == 0


def test_g1_curve_gadget_matches_host():
    rng = random.Random(11)
    pb = Protoboard(R_W)
    gt = fe.gadget_towers(pb, "bls12-377")
    crv = hc.g1_curve("bls12-377")
    gcrv = co.CurveGadget(gt["fq"], 0, P.BLS12_377_B)
    p_h = crv.random_point(rng)
    q_h = crv.random_point(rng)
    p = gcrv.constant_point(p_h)
    q = gcrv.constant_point(q_h)
    d = gcrv.dbl(p)
    s = gcrv.add_unequal(p, q)
    w = _finish(pb)
    assert gcrv.value(w, d) == crv.dbl(p_h)
    assert gcrv.value(w, s) == crv.add(p_h, q_h)


def test_g2_curve_gadget_matches_host():
    rng = random.Random(13)
    pb = Protoboard(R_W)
    gt = fe.gadget_towers(pb, "bls12-377")
    crv = hc.g2_curve("bls12-377")
    gcrv = co.CurveGadget(gt["fq2"], crv.a, crv.b)
    p_h = crv.random_point(rng)
    q_h = crv.random_point(rng)
    d = gcrv.dbl(gcrv.constant_point(p_h))
    s = gcrv.add_unequal(gcrv.constant_point(p_h), gcrv.constant_point(q_h))
    w = _finish(pb)
    assert crv.eq(gcrv.value(w, d), crv.dbl(p_h))
    assert crv.eq(gcrv.value(w, s), crv.add(p_h, q_h))


def test_msm_with_offset_matches_host():
    rng = random.Random(17)
    pb = Protoboard(R_W)
    gt = fe.gadget_towers(pb, "bls12-377")
    crv = hc.g1_curve("bls12-377")
    gcrv = co.CurveGadget(gt["fq"], 0, P.BLS12_377_B)
    nbits = 16
    pts_h = [crv.random_point(rng) for _ in range(2)]
    scalars = [rng.randrange(1 << nbits) for _ in range(2)]
    D = crv.random_point(rng)
    D_final = crv._mul_raw(1 << nbits, D)
    bit_lists = [
        [LC.const((s >> i) & 1) for i in range(nbits)] for s in scalars
    ]
    res = gcrv.msm_with_offset(
        [gcrv.constant_point(p) for p in pts_h], bit_lists, D, D_final
    )
    w = _finish(pb)
    expect = crv.msm(scalars, pts_h)
    assert gcrv.value(w, res) == expect


def test_mimc_gadget_matches_host():
    pb = Protoboard(R_W)
    vals = [3, 5, 7]
    digest = mimc.mimc_hash_inputs_gadget(pb, [LC.const(v) for v in vals])
    w = _finish(pb)
    assert pb.lc_val(w, digest) == mimc.mimc_hash_inputs(vals, R_W)
    # distinct inputs give distinct digests
    assert mimc.mimc_hash_inputs([3, 5, 8], R_W) != mimc.mimc_hash_inputs(
        vals, R_W
    )


# ---------------------------------------------------------------------------
# BLAKE2s (joinsplit hash; reference aggregator_test.cpp:52)
# ---------------------------------------------------------------------------


def test_blake2s_host_matches_hashlib():
    import hashlib

    from zecale_tpu.gadgets import blake2s as b2

    rng = random.Random(40)
    for n in (0, 1, 31, 32, 63, 64, 65, 104, 128, 200):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert b2.blake2s_host(data) == hashlib.blake2s(data).digest(), n


def test_blake2s_bits_roundtrip():
    from zecale_tpu.gadgets import blake2s as b2

    data = bytes(range(64))
    assert b2.bits_be_to_bytes(b2.bytes_to_bits_be(data)) == data


@pytest.mark.parametrize("nbytes", [64, 104])
def test_blake2s_gadget_matches_host(nbytes):
    """One- and two-block messages (the joinsplit's PRF and commitment
    preimage sizes) through the in-circuit gadget."""
    import hashlib

    from zecale_tpu.gadgets import blake2s as b2

    r = P.BLS12_377_R  # nested field, where the joinsplit lives
    rng = random.Random(41)
    data = bytes(rng.randrange(256) for _ in range(nbytes))

    pb = Protoboard(r)
    in_vars = pb.allocate_array(8 * nbytes)
    in_bits = [LC.of_var(v) for v in in_vars]
    for bit in in_bits:
        pb.enforce_boolean(bit)
    digest_bits = b2.blake2s_gadget(pb, in_bits)

    bits = b2.bytes_to_bits_be(data)

    def extra(w):
        for v, bit in zip(in_vars, bits):
            w[v] = bit

    w = _finish(pb, extra)
    got = b2.bits_be_to_bytes([pb.lc_val(w, b) for b in digest_bits])
    assert got == hashlib.blake2s(data).digest()


def test_sparse_line_mul_matches_full_fq12_mul():
    """The pairing gadget's sparse line multiplication (36 base muls) must
    agree with the full Fq12 Karatsuba product (54) and actually save
    constraints (VERDICT round-1 item 8)."""
    from zecale_tpu.gadgets.pairing_gadget import BLS12PairingGadget

    rng = random.Random(23)
    pb = Protoboard(R_W)
    gt = fe.gadget_towers(pb, "bls12-377")
    ht = hf.towers("bls12-377")
    pg = BLS12PairingGadget(pb, gt)
    H12, H2, Hq = ht["fq12"], ht["fq2"], ht["fq"]

    f_h = H12.rand(rng)
    yp_h = Hq.rand(rng)
    lam_h = H2.rand(rng)
    c_h = H2.rand(rng)
    # host line value in the _line_fq12 layout: ((yp,0,0), (-lam*xp... here
    # the B-half entries are arbitrary Fq2 values b0, b1)
    b0_h, b1_h = lam_h, c_h
    zero2 = H2.zero()
    line_h = H12.from_list(
        H2.to_list(H2.from_list([yp_h, 0]))
        + H2.to_list(zero2) + H2.to_list(zero2)
        + H2.to_list(b0_h) + H2.to_list(b1_h) + H2.to_list(zero2)
    )

    F12, F2 = gt["fq12"], gt["fq2"]
    f_g = F12.constant(f_h)
    line_g = (
        ((LC.const(yp_h), LC()), F2.zero(), F2.zero()),
        (F2.constant(b0_h), F2.constant(b1_h), F2.zero()),
    )

    n0 = len(pb.constraints)
    full = F12.mul(f_g, line_g)
    n_full = len(pb.constraints) - n0

    n0 = len(pb.constraints)
    sparse = pg._mul_by_line(f_g, line_g)
    n_sparse = len(pb.constraints) - n0

    w = _finish(pb)
    expect = H12.mul(f_h, line_h)
    assert H12.eq(F12.value(w, full), expect)
    assert H12.eq(F12.value(w, sparse), expect)
    # >=30% constraint reduction on the line multiplication
    assert n_sparse <= 0.7 * n_full, (n_sparse, n_full)
