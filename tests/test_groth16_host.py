"""End-to-end Groth16 host prove/verify on small circuits (dummy app)."""

import random

import pytest

from zecale_tpu.aggregator import dummy_app as da
from zecale_tpu.snark.groth16 import Groth16
from zecale_tpu.snark.r1cs import R1CS
from zecale_tpu.ff import params as P


@pytest.mark.parametrize("curve", ["bls12-377", "bw6-761", "mnt4-298"])
@pytest.mark.slow
def test_dummy_app_prove_verify(curve):
    rng = random.Random(1234)
    r1cs, kp = da.dummy_app_setup(curve, rng)
    snark = Groth16(curve)
    ep = da.dummy_app_prove(curve, kp, 7, rng)
    assert snark.verify(ep.inputs, ep.proof, kp.vk)
    # wrong input fails
    assert not snark.verify([8], ep.proof, kp.vk)
    # corrupted proof fails
    bad = da.dummy_app_prove(curve, kp, 8, rng)
    assert not snark.verify([7], bad.proof, kp.vk)


@pytest.mark.slow
def test_multi_constraint_circuit():
    """x1*x2=y1, y1*x3=y2, y2 public: exercises H(x) with a larger domain."""
    curve = "bls12-377"
    r = P.CURVES[curve].r
    rng = random.Random(99)
    r1cs = R1CS(r=r, num_primary=1, num_aux=4)
    # vars: 0=ONE, 1=y2(pub), 2=x1, 3=x2, 4=x3, 5=y1
    r1cs.add_constraint([(2, 1)], [(3, 1)], [(5, 1)])
    r1cs.add_constraint([(5, 1)], [(4, 1)], [(1, 1)])
    # add a linear-combination constraint: (x1 + 2 x2) * 1 = y1_lin
    # reuse var 5? no - keep only two constraints; pad anyway
    x1, x2, x3 = 3, 5, 11
    y1 = x1 * x2 % r
    y2 = y1 * x3 % r
    assignment = [1, y2, x1, x2, x3, y1]
    assert r1cs.is_satisfied(assignment)
    snark = Groth16(curve)
    kp = snark.generate_setup(r1cs, rng)
    proof = snark.prove(r1cs, kp.pk, assignment, rng)
    assert snark.verify([y2], proof, kp.vk)
    assert not snark.verify([y2 + 1], proof, kp.vk)


@pytest.mark.parametrize("curve", ["bls12-377", "mnt4-298"])
@pytest.mark.slow
def test_pghr13_prove_verify(curve):
    from zecale_tpu.snark.pghr13 import Pghr13
    from zecale_tpu.aggregator import dummy_app as da

    rng = random.Random(777)
    r1cs = da.dummy_app_r1cs(curve)
    snark = Pghr13(curve)
    kp = snark.generate_setup(r1cs, rng)
    asg = da.dummy_app_assignment(curve, 7)
    proof = snark.prove(r1cs, kp.pk, asg, rng)
    assert snark.verify([7], proof, kp.vk)
    assert not snark.verify([8], proof, kp.vk)
    # proof from a different statement fails
    other = snark.prove(r1cs, kp.pk, da.dummy_app_assignment(curve, 9), rng)
    assert snark.verify([9], other, kp.vk)
    assert not snark.verify([7], other, kp.vk)
