"""Batch-32 settlement-config aggregation (SURVEY section 7 step 10;
round-3 VERDICT weak #9 / next-round item 8 — previously unattempted).

Aggregates 32 dummy-app BLS12-377 proofs into ONE BW6-761 wrapper proof:
witness (native C hook replay) + trusted setup + prove + host verify +
primary-layout checks.  Default prover is the native C engine
(correctness E2E on any host); --tpu routes setup/prove through the TPU
prover (msm4 window-group chunking keeps the ~1M-constraint MSMs inside
HBM).

Usage: python scripts/batch32_e2e.py [--batch 32] [--tpu]
       [--cache DIR]
"""

import argparse
import os
import pickle
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--cache", default="/tmp/zecale_batch32_cache")
    args = ap.parse_args()
    os.makedirs(args.cache, exist_ok=True)

    from zecale_tpu.aggregator import dummy_app as da
    from zecale_tpu.aggregator.circuit import AggregatorCircuit

    rng = random.Random(23)
    B = args.batch

    t0 = time.time()
    _, nkp = da.dummy_app_setup("bls12-377", rng)
    eps = [
        da.dummy_app_prove("bls12-377", nkp, 100 + i, rng)
        for i in range(B)
    ]
    print(f"[1] {B} nested dummy-app proofs: {time.time()-t0:.1f}s",
          flush=True)

    t0 = time.time()
    cpath = os.path.join(args.cache, f"wrapper_circuit_b{B}.pkl")
    if os.path.exists(cpath):
        with open(cpath, "rb") as f:
            circ = pickle.load(f)
        print(f"[2] wrapper circuit (cached): {time.time()-t0:.1f}s",
              flush=True)
    else:
        circ = AggregatorCircuit(1, B)
        try:
            with open(cpath + ".tmp", "wb") as f:
                pickle.dump(circ, f)
            os.replace(cpath + ".tmp", cpath)
        except Exception as e:
            print(f"    (not cacheable: {e})", flush=True)
        print(
            f"[2] wrapper circuit built: {time.time()-t0:.1f}s "
            f"({circ.r1cs.num_constraints} constraints, "
            f"{circ.r1cs.num_variables} variables)",
            flush=True,
        )

    # witness timing (the native C hook-replay engine)
    t0 = time.time()
    w = circ.generate_witness(nkp.vk, eps)
    dt_wit = time.time() - t0
    print(f"[3] witness (native hook replay): {dt_wit:.1f}s", flush=True)
    assert w[1] == circ.compute_nested_vk_hash(nkp.vk)
    assert w[2] == (1 << B) - 1, "all result bits must be set"

    if args.tpu:
        from zecale_tpu.snark.groth16_tpu import Groth16TPU, pack_pk8

        prover = Groth16TPU("bw6-761")
    else:
        from zecale_tpu.snark.groth16_native import Groth16Native

        prover = Groth16Native("bw6-761")

    t0 = time.time()
    kpath = os.path.join(
        args.cache, f"wrapper_keypair_b{B}_{'tpu' if args.tpu else 'nat'}.pkl"
    )
    if os.path.exists(kpath):
        with open(kpath, "rb") as f:
            wkp = pickle.load(f)
        print(f"[4] wrapper keypair (cached): {time.time()-t0:.1f}s",
              flush=True)
    else:
        wkp = prover.generate_setup(circ.r1cs, rng)
        try:
            with open(kpath + ".tmp", "wb") as f:
                pickle.dump(wkp, f)
            os.replace(kpath + ".tmp", kpath)
        except Exception as e:
            print(f"    (not cacheable: {e})", flush=True)
        print(f"[4] wrapper trusted setup: {time.time()-t0:.1f}s",
              flush=True)

    timings = {}
    t0 = time.time()
    if args.tpu:
        dpk = pack_pk8("bw6-761", wkp.pk, circ.r1cs.num_primary + 1)
        print(f"    pk packed to device: {time.time()-t0:.1f}s",
              flush=True)
        t0 = time.time()
        proof = prover.prove(
            circ.r1cs, wkp.pk, w, rng, device_pk=dpk, timings=timings
        )
    else:
        proof = prover.prove(circ.r1cs, wkp.pk, w, rng)
    dt_prove = time.time() - t0
    print(f"[5] wrapper prove: {dt_prove:.1f}s {timings}", flush=True)

    t0 = time.time()
    inputs = w[1 : 1 + circ.num_primary_inputs]
    assert prover.verify(inputs, proof, wkp.vk), "wrapper must verify"
    print(f"[6] host verify: {time.time()-t0:.1f}s", flush=True)
    for i in range(B):
        assert inputs[2 + i] == 100 + i
    print(
        f"BATCH-{B} OK: witness {dt_wit:.1f}s, prove {dt_prove:.1f}s "
        f"({B/dt_prove:.3f} aggregated proofs/s)",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
