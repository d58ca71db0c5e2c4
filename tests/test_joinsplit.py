"""Zeth-style joinsplit nested application (reference rollup test analog:
libzecale/tests/aggregator/aggregator_test.cpp:74-314)."""

import random

import pytest

from zecale_tpu.ff import params as P
from zecale_tpu.zeth import merkle, notes

R = P.BLS12_377_R


def test_merkle_tree_host_and_gadget():
    from zecale_tpu.gadgets.protoboard import LC, Protoboard

    depth = 4
    t = merkle.MerkleTreeField(depth, R)
    rng = random.Random(50)
    vals = {a: rng.randrange(R) for a in (0, 1, 5, 15)}
    for a, v in vals.items():
        t.set_value(a, v)
    # host: recompute root by hand along each path
    for a, v in vals.items():
        cur = v
        for lvl, sib in enumerate(t.get_path(a)):
            bit = (a >> lvl) & 1
            left, right = (sib, cur) if bit else (cur, sib)
            cur = merkle.node_hash(left, right, R)
        assert cur == t.get_root()

    # gadget: same recomputation in-circuit
    a = 5
    pb = Protoboard(R)
    addr_bits = [LC.const((a >> i) & 1) for i in range(depth)]
    path = [LC.const(s) for s in t.get_path(a)]
    root_lc = merkle.merkle_root_gadget(pb, LC.const(vals[a]), addr_bits, path)
    w = pb.generate_witness([0] * pb.num_primary)
    assert pb.to_r1cs().is_satisfied(w)
    assert pb.lc_val(w, root_lc) == t.get_root()


from zecale_tpu.zeth.dev_vectors import make_test_joinsplit  # noqa: E402


@pytest.mark.slow
def test_joinsplit_witness_satisfiable():
    from zecale_tpu.zeth.joinsplit import JoinsplitCircuit

    circ = JoinsplitCircuit()
    rng = random.Random(51)
    js = make_test_joinsplit(rng)
    w = circ.generate_witness(**js)
    bad = circ.r1cs.first_failing_constraint(w)
    assert bad is None, f"constraint {bad} fails"

    # the single primary input is the public-data hash
    # (aggregator_test.cpp:63-65); recompute it on the host
    from zecale_tpu.gadgets import mimc

    cap = circ.capacity
    mask = (1 << cap) - 1

    def fpart(d: bytes) -> int:
        return int.from_bytes(d, "big") & mask

    def rpart(d: bytes) -> int:
        return int.from_bytes(d, "big") >> cap

    nf = [inp.nullifier() for inp in js["inputs"]]
    h = [
        notes.prf_pk(inp.a_sk, i, js["h_sig"])
        for i, inp in enumerate(js["inputs"])
    ]
    cm_out = [n.commitment_field(R) for n in js["outputs"]]
    residual = (
        (js["vpub_in"] << 84)
        | (js["vpub_out"] << 20)
        | (rpart(js["h_sig"]) << 16)
        | (rpart(nf[0]) << 12)
        | (rpart(nf[1]) << 8)
        | (rpart(h[0]) << 4)
        | rpart(h[1])
    )
    public_data = (
        [js["root"]]
        + [fpart(x) for x in nf]
        + cm_out
        + [fpart(js["h_sig"])]
        + [fpart(x) for x in h]
        + [residual]
    )
    assert w[1] == mimc.mimc_hash_inputs(public_data, R)


@pytest.mark.slow
def test_joinsplit_rejects_bad_balance():
    from zecale_tpu.zeth.joinsplit import JoinsplitCircuit

    circ = JoinsplitCircuit()
    rng = random.Random(52)
    js = make_test_joinsplit(rng)
    js["vpub_out"] += 1  # steal one wei
    w = circ.generate_witness(**js)
    assert circ.r1cs.first_failing_constraint(w) is not None


@pytest.mark.slow
def test_joinsplit_rejects_wrong_root():
    from zecale_tpu.zeth.joinsplit import JoinsplitCircuit

    circ = JoinsplitCircuit()
    rng = random.Random(53)
    js = make_test_joinsplit(rng)
    js["root"] = (js["root"] + 1) % R  # funded input: root check must bind
    w = circ.generate_witness(**js)
    assert circ.r1cs.first_failing_constraint(w) is not None
