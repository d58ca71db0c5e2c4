"""Settlement-layer tests: word encodings, the Groth16BW6_761 contract model
against the golden vectors, and process_batch dispatch semantics."""

import json
import os

import pytest

from zecale_tpu.contracts import dispatcher as dp
from zecale_tpu.serialization import json_codec as jc

TESTDATA = "/root/reference/testdata/dummy_app"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(TESTDATA), reason="reference testdata not available"
)


def _load(name):
    with open(os.path.join(TESTDATA, name)) as f:
        return json.load(f)


def test_word_encodings_roundtrip():
    v = (123 << 300) | 456
    words = dp._int_to_words(v, 3)
    assert len(words) == 3
    assert dp._words_to_int(words) == v
    assert dp.num_inputs_from_vk_length(len(dp._int_to_words(0, 1)) * 0 + 54) == 5


@needs_testdata
@pytest.mark.slow
def test_contract_verifier_accepts_golden_batch():
    vk = jc.groth16_vk_from_json("bw6-761", _load("aggregator_vk.json"))
    ep = jc.extended_proof_from_json("bw6-761", _load("batch1.json")["ext_proof"])
    vk_words = dp.vk_to_contract_parameters(vk)
    proof_words = dp.proof_to_contract_parameters(ep.proof)
    input_words = dp.inputs_to_contract_parameters(ep.inputs)
    assert len(proof_words) == 18
    assert dp.num_inputs_from_vk_length(len(vk_words)) == len(ep.inputs)
    v = dp.Groth16BW6Verifier()
    assert v.verify(vk_words, proof_words, input_words)
    # corrupt one input word -> reject
    bad = list(input_words)
    bad[-1] ^= 1
    assert not v.verify(vk_words, proof_words, bad)


def test_process_batch_dispatch_semantics():
    """Result-bit handling + app checks, with the pairing check stubbed
    (mirrors how the reference separates the dispatcher semantics from the
    precompile-backed verifier)."""

    class AlwaysVerify:
        def verify(self, *a):
            return True

    # vk sized for batch 2, 1 input per tx: total inputs = 4 -> abc len 5
    vk_words = [0] * (dp.POINT_WORDS * (3 + 5))
    eng = dp.DispatcherEngine(vk_words, batch_size=2)
    eng.verifier = AlwaysVerify()
    assert eng.inputs_per_nested_tx == 1

    app = dp.DummyApplicationEngine(eng, expected_vk_hash=77)
    # inputs: vk_hash=77, results=0b01, nested inputs 5 and 6
    input_words = (
        dp._int_to_words(77, 2)
        + dp._int_to_words(0b01, 2)
        + dp._int_to_words(5, 2)
        + dp._int_to_words(6, 2)
    )
    ok = eng.process_batch(
        [0] * 18, input_words, [b"p0", b"p1"], app
    )
    assert ok
    # only proof 0 (result bit 1) dispatched
    assert app.get(5) == b"p0"
    assert app.get(6) is None
    assert ("log", "skipping invalid proof", 1) in eng.events

    # replay: same scalar again -> app rejects
    input_words2 = (
        dp._int_to_words(77, 2)
        + dp._int_to_words(0b11, 2)
        + dp._int_to_words(5, 2)
        + dp._int_to_words(9, 2)
    )
    with pytest.raises(AssertionError):
        eng.process_batch([0] * 18, input_words2, [b"x", b"y"], app)

    # wrong vk hash -> app rejects
    input_words3 = (
        dp._int_to_words(78, 2)
        + dp._int_to_words(0b01, 2)
        + dp._int_to_words(10, 2)
        + dp._int_to_words(11, 2)
    )
    with pytest.raises(AssertionError):
        eng.process_batch([0] * 18, input_words3, [b"x", b"y"], app)
