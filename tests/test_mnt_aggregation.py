"""MNT4-298 -> MNT6-298 aggregation circuit (alternate curve pair,
reference ZECALE_CURVE=MNT6 configuration)."""

import random

import pytest

from zecale_tpu.aggregator import dummy_app as da
from zecale_tpu.aggregator.circuit import AggregatorCircuit
from zecale_tpu.snark.groth16 import ExtendedProof


@pytest.mark.slow
def test_mnt_wrapper_witness():
    circ = AggregatorCircuit(1, 1, wrapper_curve="mnt6-298")
    assert circ.NESTED_CURVE == "mnt4-298"
    rng = random.Random(31)
    _, nkp = da.dummy_app_setup("mnt4-298", rng)
    ep = da.dummy_app_prove("mnt4-298", nkp, 7, rng)
    w = circ.generate_witness(nkp.vk, [ep])
    assert circ.r1cs.first_failing_constraint(w) is None
    assert w[1] == circ.compute_nested_vk_hash(nkp.vk)
    assert w[2] == 1  # valid proof -> result bit 1
    assert w[3] == 7
    # corrupt -> result 0, still satisfiable
    bad = ExtendedProof(proof=ep.proof, inputs=[8])
    w2 = circ.generate_witness(nkp.vk, [bad])
    assert circ.r1cs.first_failing_constraint(w2) is None
    assert w2[2] == 0
