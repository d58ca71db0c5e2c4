"""Aggregator (wrapper) circuit: satisfiability, layout, invalid tolerance.

Mirrors the reference's aggregator_dummy_test assertions (primary-input
layout checks aggregator_dummy_test.cpp:43-97, corrupt-proof negative test
:141-187) at witness level; full wrapper proving is covered by the TPU
prover tests / bench.
"""

import random

import pytest

from zecale_tpu.aggregator import dummy_app as da
from zecale_tpu.aggregator.circuit import AggregatorCircuit
from zecale_tpu.snark.groth16 import ExtendedProof


@pytest.fixture(scope="module")
def batch1_setup():
    circ = AggregatorCircuit(num_inputs_per_nested_proof=1, num_proofs=1)
    rng = random.Random(5)
    _, nkp = da.dummy_app_setup("bls12-377", rng)
    ep = da.dummy_app_prove("bls12-377", nkp, 7, rng)
    return circ, nkp, ep


@pytest.mark.slow
def test_wrapper_witness_valid_proof(batch1_setup):
    circ, nkp, ep = batch1_setup
    w = circ.generate_witness(nkp.vk, [ep])
    assert circ.r1cs.first_failing_constraint(w) is None
    # layout: [vk_hash, packed_results, nested_inputs...]
    assert w[1] == circ.compute_nested_vk_hash(nkp.vk)
    assert w[2] == 1  # result bit for the valid proof
    assert w[3] == 7  # embedded nested input (fp_from_fp identity)
    assert circ.num_primary_inputs == 3


@pytest.mark.slow
def test_wrapper_witness_corrupt_proof_result_zero(batch1_setup):
    circ, nkp, ep = batch1_setup
    bad = ExtendedProof(proof=ep.proof, inputs=[9])
    w = circ.generate_witness(nkp.vk, [bad])
    # still satisfiable -- invalid proofs are tolerated with result bit 0
    assert circ.r1cs.first_failing_constraint(w) is None
    assert w[2] == 0


@pytest.mark.slow
def test_wrapper_witness_wrong_vk_hash_changes(batch1_setup):
    circ, nkp, ep = batch1_setup
    rng = random.Random(99)
    _, other_kp = da.dummy_app_setup("bls12-377", rng)
    w = circ.generate_witness(other_kp.vk, [ep])
    assert w[1] == circ.compute_nested_vk_hash(other_kp.vk)
    assert w[1] != circ.compute_nested_vk_hash(nkp.vk)
    # proof under the wrong vk -> result 0, still satisfiable
    assert circ.r1cs.first_failing_constraint(w) is None
    assert w[2] == 0


def test_input_count_validation():
    circ = object.__new__(AggregatorCircuit)  # avoid full build
    circ.num_proofs = 2
    circ.num_inputs = 1
    with pytest.raises(ValueError):
        AggregatorCircuit.generate_witness(circ, None, [])


@pytest.mark.slow
def test_batch8_rollup_config():
    """The batch-8 zk-zk-rollup configuration (BASELINE.json configs[2]) at
    witness level: 8 nested proofs, one corrupted -> results 0b11110111."""
    circ = AggregatorCircuit(1, 8)
    rng = random.Random(5)
    _, nkp = da.dummy_app_setup("bls12-377", rng)
    eps = [da.dummy_app_prove("bls12-377", nkp, 7 + i, rng) for i in range(8)]
    eps[3] = ExtendedProof(proof=eps[3].proof, inputs=[999])
    w = circ.generate_witness(nkp.vk, eps)
    from zecale_tpu.native.witness import NativeR1CS

    nat = NativeR1CS(circ.r1cs)
    bad = (
        nat.first_failing_constraint(w)
        if nat.available
        else circ.r1cs.first_failing_constraint(w)
    )
    assert bad is None
    assert w[2] == 0b11110111


def test_parallel_witness_matches_sequential():
    """Forked per-proof witness replay (SURVEY section 2c 'pipeline across
    proof batch') is value-exact vs the sequential program."""
    import random

    from zecale_tpu.aggregator import dummy_app as da
    from zecale_tpu.aggregator.circuit import AggregatorCircuit

    rng = random.Random(3)
    _, kp = da.dummy_app_setup("bls12-377", rng)
    proofs = [da.dummy_app_prove("bls12-377", kp, 30 + i) for i in range(2)]
    circ = AggregatorCircuit(1, 2, hash_nested_vk=False)
    w_seq = circ.generate_witness(kp.vk, proofs, parallel=False)
    w_par = circ.generate_witness(kp.vk, proofs, parallel=True)
    assert w_seq == w_par
    assert circ.r1cs.first_failing_constraint(w_par) is None
