"""Full zk-zk-rollup on real hardware — the reference's SLOW
aggregator_test.cpp flow: a Zeth-style joinsplit (BLAKE2s + MiMC Merkle
tree, 2-in/2-out, depth 4, ~350k constraints) proved on BLS12-377 with the
TPU prover, then a batch of those proofs aggregated into one BW6-761
wrapper proof, host-verified, with primary-layout checks.

Usage: python scripts/rollup_e2e.py [--batch 2] [--cache DIR]
(real TPU by default; JAX_PLATFORMS=cpu + unset PALLAS_AXON_POOL_IPS for a
CPU dry run).
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


class _DeviceProver:
    """Adapter fixing the device pk for circuit prove() calls."""

    def __init__(self, prover, dpk):
        self.prover = prover
        self.dpk = dpk

    def prove(self, r1cs, pk, assignment, rng=None):
        return self.prover.prove(r1cs, pk, assignment, rng, device_pk=self.dpk)


def _cached(path, build, what):
    t0 = time.time()
    if os.path.exists(path):
        with open(path, "rb") as f:
            obj = pickle.load(f)
        print(f"[cache] {what} loaded: {time.time()-t0:.1f}s", flush=True)
        return obj
    obj = build()
    dt = time.time() - t0
    try:
        # atomic write: a failed dump must not leave a corrupt cache file
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(obj, f)
        os.replace(tmp, path)
    except Exception as e:  # circuit closures may not pickle
        try:
            os.remove(tmp)
        except OSError:
            pass
        print(f"    ({what} not cacheable: {e})", flush=True)
    print(f"[build] {what}: {dt:.1f}s", flush=True)
    return obj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--cache", default="/tmp/zecale_rollup_cache")
    ap.add_argument("--skip-negative", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.cache, exist_ok=True)

    import jax

    print("devices:", jax.devices(), flush=True)

    from zecale_tpu.aggregator.circuit import AggregatorCircuit
    from zecale_tpu.snark.groth16 import ExtendedProof, Groth16
    from zecale_tpu.snark.groth16_tpu import Groth16TPU, pack_pk8
    from zecale_tpu.zeth.dev_vectors import make_test_joinsplit
    from zecale_tpu.zeth.joinsplit import JoinsplitCircuit

    rng = random.Random(17)

    # 1. joinsplit circuit (the nested application)
    js_circ = _cached(
        os.path.join(args.cache, "joinsplit_circuit.pkl"),
        lambda: JoinsplitCircuit(),
        "joinsplit circuit",
    )
    print(f"    joinsplit: {js_circ.r1cs.num_constraints} constraints",
          flush=True)

    # 2. joinsplit trusted setup on TPU (BLS12-377)
    nprover = Groth16TPU("bls12-377")
    nkp = _cached(
        os.path.join(args.cache, "joinsplit_keypair.pkl"),
        lambda: nprover.generate_setup(js_circ.r1cs, rng),
        "joinsplit trusted setup (TPU)",
    )

    # 3. joinsplit proofs on TPU
    t0 = time.time()
    ndpk = pack_pk8("bls12-377", nkp.pk, js_circ.r1cs.num_primary + 1)
    print(f"[3] nested pk packed to device: {time.time()-t0:.1f}s", flush=True)
    host_n = Groth16(js_circ.curve_name)
    eps = []
    for i in range(args.batch):
        t0 = time.time()
        js = make_test_joinsplit(random.Random(100 + i))
        ep = js_circ.prove(
            **js, pk=nkp.pk, rng=rng,
            prover=_DeviceProver(nprover, ndpk), check=(i == 0),
        )
        dt = time.time() - t0
        t0 = time.time()
        assert host_n.verify(ep.inputs, ep.proof, nkp.vk)
        print(f"[3] joinsplit proof {i}: prove {dt:.1f}s, "
              f"host verify {time.time()-t0:.1f}s", flush=True)
        eps.append(ep)

    # 4. wrapper circuit (batch aggregation of joinsplit proofs)
    wcirc = _cached(
        os.path.join(args.cache, f"wrapper_circuit_b{args.batch}.pkl"),
        lambda: AggregatorCircuit(1, args.batch),
        "wrapper circuit",
    )
    print(f"    wrapper: {wcirc.r1cs.num_constraints} constraints", flush=True)

    wprover = Groth16TPU("bw6-761")
    wkp = _cached(
        os.path.join(args.cache, f"wrapper_keypair_b{args.batch}.pkl"),
        lambda: wprover.generate_setup(wcirc.r1cs, rng),
        "wrapper trusted setup (TPU)",
    )

    t0 = time.time()
    wdpk = pack_pk8("bw6-761", wkp.pk, wcirc.r1cs.num_primary + 1)
    print(f"[4] wrapper pk packed to device: {time.time()-t0:.1f}s",
          flush=True)

    # 5. the wrapping proof
    t0 = time.time()
    wep = wcirc.prove(nkp.vk, eps, wkp.pk, rng,
                      prover=_DeviceProver(wprover, wdpk), check=True)
    dt = time.time() - t0
    print(f"[5] ROLLUP WRAPPING PROOF generated: {dt:.1f}s "
          f"({args.batch/dt:.3f} aggregated joinsplits/s)", flush=True)

    # 6. verify + layout (vk hash, result bits, hashed joinsplit inputs)
    host_w = Groth16("bw6-761")
    t0 = time.time()
    ok = host_w.verify(wep.inputs, wep.proof, wkp.vk)
    print(f"[6] wrapper proof verifies: {ok} ({time.time()-t0:.1f}s)",
          flush=True)
    assert ok
    assert wep.inputs[0] == wcirc.compute_nested_vk_hash(nkp.vk)
    assert wep.inputs[1] == (1 << args.batch) - 1
    for i in range(args.batch):
        assert wep.inputs[2 + i] == eps[i].inputs[0]
    print("[6] primary layout [vk_hash, results, js_hashes...] OK", flush=True)

    if not args.skip_negative:
        # 7. corrupt one joinsplit input -> result bit 0, wrapper still valid
        bad = list(eps)
        bad[-1] = ExtendedProof(proof=bad[-1].proof,
                                inputs=[(bad[-1].inputs[0] + 1)])
        t0 = time.time()
        wep2 = wcirc.prove(nkp.vk, bad, wkp.pk, rng,
                           prover=_DeviceProver(wprover, wdpk), check=True)
        assert host_w.verify(wep2.inputs, wep2.proof, wkp.vk)
        assert wep2.inputs[1] == (1 << (args.batch - 1)) - 1
        print(f"[7] corrupt-joinsplit negative case OK ({time.time()-t0:.1f}s)",
              flush=True)

    print("FULL ZK-ZK-ROLLUP PASSED", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
