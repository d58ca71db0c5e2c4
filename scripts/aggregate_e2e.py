"""End-to-end aggregation on real hardware: nested proofs -> wrapper proof.

Runs the complete flow the reference exercises in its SLOW gtest suite
(aggregator_dummy_test.cpp): dummy-app setup + proofs on BLS12-377, wrapper
circuit setup on BW6-761, wrapping proof via the TPU prover, host
verification of the wrapper proof, primary-input layout checks, and the
corrupt-proof negative case.

Usage: python scripts/aggregate_e2e.py [--batch 2] [--cache DIR]
(defaults to the real TPU; set JAX_PLATFORMS=cpu + unset
PALLAS_AXON_POOL_IPS for a CPU run).
"""

import argparse
import os
import pickle
import random
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--cache", default="/tmp/zecale_cache")
    ap.add_argument("--skip-negative", action="store_true")
    ap.add_argument("--json", default="", help="write summary JSON here")
    args = ap.parse_args()
    os.makedirs(args.cache, exist_ok=True)

    import jax

    print("devices:", jax.devices(), flush=True)

    from zecale_tpu.aggregator import dummy_app as da
    from zecale_tpu.aggregator.circuit import AggregatorCircuit
    from zecale_tpu.snark.groth16 import ExtendedProof, Groth16
    from zecale_tpu.snark.groth16_tpu import Groth16TPU, pack_pk8

    rng = random.Random(11)

    # 1. nested app proofs (tiny circuit -- host path is fine)
    t0 = time.time()
    _, nkp = da.dummy_app_setup("bls12-377", rng)
    eps = [da.dummy_app_prove("bls12-377", nkp, 7 + i, rng) for i in range(args.batch)]
    print(f"[1] nested setup+proofs: {time.time()-t0:.1f}s", flush=True)

    # 2. wrapper circuit
    t0 = time.time()
    circ_cache = os.path.join(args.cache, f"circuit_b{args.batch}.pkl")
    circ = None
    if os.path.exists(circ_cache):
        try:
            with open(circ_cache, "rb") as f:
                circ = pickle.load(f)
            print(f"[2] circuit loaded: {time.time()-t0:.1f}s "
                  f"({circ.r1cs.num_constraints} constraints)", flush=True)
        except Exception as e:
            print(f"    (stale circuit cache ignored: {e})", flush=True)
            os.unlink(circ_cache)
            circ = None
    if circ is None:
        circ = AggregatorCircuit(1, args.batch)
        try:
            tmp = circ_cache + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(circ, f)
            os.replace(tmp, circ_cache)
        except Exception as e:
            print(f"    (circuit not cacheable: {e})")
            for p in (circ_cache, circ_cache + ".tmp"):
                if os.path.exists(p):
                    os.unlink(p)
        print(f"[2] circuit built: {time.time()-t0:.1f}s "
              f"({circ.r1cs.num_constraints} constraints)", flush=True)

    # 3. wrapper trusted setup (native C engine when available), cached
    prover = Groth16TPU("bw6-761")
    kp_cache = os.path.join(args.cache, f"keypair_b{args.batch}.pkl")
    t0 = time.time()
    if os.path.exists(kp_cache):
        with open(kp_cache, "rb") as f:
            wkp = pickle.load(f)
        print(f"[3] keypair loaded: {time.time()-t0:.1f}s", flush=True)
    else:
        from zecale_tpu.native import ec as _nec
        if _nec.available():
            from zecale_tpu.snark.groth16_native import Groth16Native
            wkp = Groth16Native("bw6-761").generate_setup(circ.r1cs, rng)
        else:
            wkp = prover.generate_setup(circ.r1cs, rng)
        with open(kp_cache, "wb") as f:
            pickle.dump(wkp, f)
        print(f"[3] trusted setup (TPU): {time.time()-t0:.1f}s", flush=True)

    # 4. device-resident pk (round-2 affine 8-bit packing)
    t0 = time.time()
    dpk = pack_pk8("bw6-761", wkp.pk, circ.r1cs.num_primary + 1)
    print(f"[4] pk packed to device: {time.time()-t0:.1f}s", flush=True)

    # 5. wrapping proof (TPU)
    dev_prover = _DeviceProver(prover, dpk)
    t0 = time.time()
    wep = circ.prove(nkp.vk, eps, wkp.pk, rng,
                     prover=dev_prover, check=True)
    prove_time = time.time() - t0
    cold_phases = dict(dev_prover.last_timings)
    print(f"[5] WRAPPING PROOF generated: {prove_time:.1f}s "
          f"({args.batch/prove_time:.3f} aggregated proofs/s)", flush=True)

    # 6. verify + layout checks
    host_w = Groth16("bw6-761")
    t0 = time.time()
    ok = host_w.verify(wep.inputs, wep.proof, wkp.vk)
    print(f"[6] wrapper proof verifies: {ok} ({time.time()-t0:.1f}s)", flush=True)
    assert ok
    assert wep.inputs[0] == circ.compute_nested_vk_hash(nkp.vk)
    assert wep.inputs[1] == (1 << args.batch) - 1  # all results valid
    for i in range(args.batch):
        assert wep.inputs[2 + i] == 7 + i
    print("[6] primary layout [vk_hash, results, inputs...] OK", flush=True)

    # 6b. settle through the word-level dispatcher engine (the on-chain
    # path of scripts/test-client, minus ganache): encode calldata, verify
    # via the contract model, dispatch to the dummy application
    from zecale_tpu.contracts import dispatcher as dp

    vk_words = dp.vk_to_contract_parameters(wkp.vk)
    eng = dp.DispatcherEngine(vk_words, batch_size=args.batch)
    app = dp.DummyApplicationEngine(
        eng, expected_vk_hash=circ.compute_nested_vk_hash(nkp.vk)
    )
    t0 = time.time()
    ok = eng.process_batch(
        dp.proof_to_contract_parameters(wep.proof),
        dp.inputs_to_contract_parameters(wep.inputs),
        [b"params%d" % i for i in range(args.batch)],
        app,
    )
    assert ok, "dispatcher rejected the batch proof"
    for i in range(args.batch):
        assert app.get(7 + i) == b"params%d" % i
    print(f"[6b] settlement via dispatcher engine OK ({time.time()-t0:.1f}s)",
          flush=True)

    warm_prove = None
    warm_phases = {}
    if not args.skip_negative:
        # 7. corrupt one nested proof -> result bit 0, proof still valid.
        # Same compiled graphs, fresh witness: THIS is the warm prove the
        # north-star aggregated-proofs/s is measured on.
        bad = list(eps)
        bad[-1] = ExtendedProof(proof=bad[-1].proof, inputs=[999])
        t0 = time.time()
        wep2 = circ.prove(nkp.vk, bad, wkp.pk, rng,
                          prover=dev_prover, check=True)
        warm_prove = time.time() - t0
        warm_phases = dict(dev_prover.last_timings)
        assert host_w.verify(wep2.inputs, wep2.proof, wkp.vk)
        assert wep2.inputs[1] == (1 << (args.batch - 1)) - 1
        print(f"[7] corrupt-proof negative case (WARM prove) OK "
              f"({warm_prove:.1f}s, "
              f"{args.batch/warm_prove:.3f} aggregated proofs/s)",
              flush=True)

    import json as _json

    summary = {
        "batch": args.batch,
        "constraints": circ.r1cs.num_constraints,
        "cold_prove_s": round(prove_time, 2),
        "cold_phases": {k: round(v, 2) for k, v in cold_phases.items()},
        "warm_prove_s": round(warm_prove, 2) if warm_prove else None,
        "warm_phases": {k: round(v, 2) for k, v in warm_phases.items()},
        "aggregated_proofs_per_s": (
            round(args.batch / warm_prove, 4) if warm_prove else None
        ),
    }
    print("E2E_JSON: " + _json.dumps(summary), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            _json.dump(summary, f)
    print("ALL CHECKS PASSED", flush=True)
    return 0


class _DeviceProver:
    """Adapter fixing the device pk for AggregatorCircuit.prove."""

    def __init__(self, prover, dpk):
        self.prover = prover
        self.dpk = dpk
        self.last_timings = {}

    def prove(self, r1cs, pk, assignment, rng=None):
        timings = {}
        proof = self.prover.prove(
            r1cs, pk, assignment, rng, device_pk=self.dpk, timings=timings
        )
        self.last_timings = timings
        print("    prover phases:",
              {k: round(v, 2) for k, v in timings.items()}, flush=True)
        return proof


if __name__ == "__main__":
    sys.exit(main())
