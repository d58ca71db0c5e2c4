"""Extended benchmark report (BASELINE.md surface): the kernels the prover
actually spends time in, not just the BLS12-377 headline.

Emits BENCH_REPORT.json with:
  * BLS12-377 G1 MSM (the bench.py headline kernel)     [TPU]
  * BW6-761 G1 MSM   (the wrapper prover's hot path)    [TPU]
  * the QAP-division FFT pipeline at wrapper scale       [TPU]
  * BW6-761 pairing product (the native verify path)     [CPU, C engine]
  * golden batch1 wrapper verification end-to-end        [CPU]

Scaling efficiency across a mesh cannot be measured on this 1-chip
environment; the sharded path's correctness is gated by
__graft_entry__.dryrun_multichip and tests/test_sharded.py on the virtual
8-device CPU mesh instead (documented in BENCH_REPORT.json).

Run on the TPU (default env): python scripts/bench_report.py
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, _REPO)

import random

import numpy as np

OUT = os.environ.get("BENCH_REPORT_OUT", "BENCH_REPORT.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _msm_bench(curve, n, c, iters=3):
    import jax

    from zecale_tpu.ec import host_curve as hc, msm8
    from zecale_tpu.ff import fp8, params as P

    r = P.CURVES[curve].r
    rng = random.Random(7)
    crv_h = hc.g1_curve(curve)
    gen = hc.generators(curve)[0]
    base, pt = [], gen
    for _ in range(64):
        base.append(pt)
        pt = crv_h.dbl(pt)
    pts = [base[i % 64] for i in range(n)]
    Fr8 = fp8.field8(r)
    pts_dev = msm8.pack_points_affine8(curve, pts)
    # round-4/5 dense-bucket engine, same routing as bench.py / the prover
    if os.environ.get("ZECALE_USE_MSM8"):
        engine, fn = "msm8", msm8.msm8_jit(curve, False, c)
    else:
        from zecale_tpu.ec import msm4

        engine, fn = "msm4", msm4.msm4_jit(curve, False, n)
    variants = [
        Fr8.pack([rng.randrange(r) for _ in range(n)], mont=False)
        for _ in range(iters)
    ]
    t0 = time.time()
    out = fn(variants[0], pts_dev)
    _ = np.asarray(out["x"])
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(iters):
        o = fn(variants[i], pts_dev)
        _ = np.asarray(o["x"]).ravel()[:1]
    dt = (time.time() - t0) / iters
    # value check on the last variant
    got = msm8.unpack_jac_point8(curve, o)
    folded = [0] * 64
    scal = Fr8.unpack(variants[-1], mont=False)
    for i, s in enumerate(scal):
        folded[i % 64] = (folded[i % 64] + s) % r
    assert got == crv_h.msm(folded, base), f"{curve} MSM mismatch"
    log(f"{curve} G1 MSM n=2^{n.bit_length()-1} c={c}: "
        f"{dt*1e3:.0f} ms ({n/dt/1e6:.4f} Mpoints/s), compile {compile_s:.0f}s")
    return {
        "n": n, "c": c, "engine": engine,
        "steady_ms": round(dt * 1e3, 1),
        "mpoints_per_s": round(n / dt / 1e6, 4),
        "compile_s": round(compile_s, 1),
    }


def _fft_bench(curve, n, iters=3):
    from zecale_tpu.ff import fp_jax, params as P
    from zecale_tpu.poly import fft_tpu

    r = P.CURVES[curve].r
    F = fp_jax.field(r)
    rng = random.Random(3)
    fn = fft_tpu.h_pipeline_jit(n, r)
    vs = [
        [F.pack([rng.randrange(r) for _ in range(n)]) for _ in range(3)]
        for _ in range(iters)
    ]
    t0 = time.time()
    out = fn(*vs[0])
    _ = np.asarray(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(iters):
        o = fn(*vs[i])
        _ = np.asarray(o).ravel()[:1]
    dt = (time.time() - t0) / iters
    log(f"{curve} QAP-division pipeline (7 transforms) n=2^"
        f"{n.bit_length()-1}: {dt*1e3:.0f} ms, compile {compile_s:.0f}s")
    return {
        "n": n, "steady_ms": round(dt * 1e3, 1),
        "transforms": 7,
        "melem_per_s": round(7 * n / dt / 1e6, 3),
        "compile_s": round(compile_s, 1),
    }


def _pairing_bench():
    import json as _json

    from zecale_tpu.serialization import json_codec as jc
    from zecale_tpu.snark.groth16 import Groth16

    with open(
        "/root/reference/testdata/dummy_app/aggregator_vk.json"
    ) as f:
        vk = jc.groth16_vk_from_json("bw6-761", _json.load(f))
    with open("/root/reference/testdata/dummy_app/batch1.json") as f:
        ep = jc.extended_proof_from_json(
            "bw6-761", _json.load(f)["ext_proof"]
        )
    snark = Groth16("bw6-761")
    t0 = time.time()
    assert snark.verify(ep.inputs, ep.proof, vk)
    dt = time.time() - t0
    log(f"golden batch1 wrapper verify (native BW6 pairing): {dt*1e3:.0f} ms")
    return {"golden_verify_ms": round(dt * 1e3, 1)}


def main():
    import jax

    report = {
        "device": str(jax.devices()),
        "scaling_note": (
            "1 real chip only in this environment; multi-device scaling is "
            "validated functionally on the virtual 8-device CPU mesh "
            "(dryrun_multichip + tests/test_sharded.py), not benchmarked"
        ),
    }
    report["verify_bw6_761"] = _pairing_bench()
    n_bls = int(os.environ.get("BENCH_BLS_N", str(1 << 18)))
    n_bw6 = int(os.environ.get("BENCH_BW6_N", str(1 << 16)))
    n_fft = int(os.environ.get("BENCH_FFT_N", str(1 << 16)))
    report["fft_bw6_761"] = _fft_bench("bw6-761", n_fft)
    report["msm_bw6_761_g1"] = _msm_bench("bw6-761", n_bw6, 11)
    report["msm_bls12_377_g1"] = _msm_bench("bls12-377", n_bls, 13)
    # merge the batch-8 wrapper e2e summary (the aggregated-proofs/s north
    # star) if a bench.py/aggregate_e2e.py run left one behind
    e2e_json = os.environ.get(
        "BENCH_E2E_JSON", "/tmp/zecale_bench_e2e_b8.json"
    )
    if os.path.exists(e2e_json):
        with open(e2e_json) as f:
            report["aggregate_e2e_b8"] = json.load(f)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    log(f"wrote {OUT}")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
