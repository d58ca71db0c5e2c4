"""Benchmark driver — runs on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "engine": ..., "aggregated_proofs_per_s": N|null, ...}

Headline metric (BASELINE.json north star): MSM throughput per chip on
BLS12-377 G1 (the dominant prover kernel), measured with the round-4/5
dense-bucket engine (ec/msm4.py; "engine" tags the JSON so history stays
comparable — ZECALE_USE_MSM8=1 reruns the round-2/3 engine).  The second
north star, aggregated proofs/s (batch-8 BW6-761 Groth16 wrapper, warm
prove), is measured by running scripts/aggregate_e2e.py --batch 8 in a
subprocess under a timeout and merged into the same JSON line (null if it
fails/times out; BENCH_E2E=0 skips it, BENCH_E2E_TIMEOUT resizes).  The
reference publishes no numbers (README.md:9; BASELINE.md) —
``vs_baseline`` is against a nominal 1.0 Mpoints/s for the reference's
libff Pippenger on a 64-core host, documented here for reproducibility.

Diagnostics on stderr: per-phase timings (utils/profiling.py — the libff
block-profiler analog) and the native C engine's CPU MSM for
cross-checking.  Set BENCH_MSM_N / BENCH_WINDOW_C to resize;
BENCH_RANDOM_POINTS=1 benches fully random points (native fixed-base
batch) instead of 64 cycled bases — the round-5 evidence run showed the
cycled-bases shortcut does not flatter the gather/sort stages (see
NOTES_ROUND5.md).
"""

import json
import os
import sys
import time

# in-repo cache: compiled TPU graphs are committed so fresh checkouts
# (and the driver's end-of-round bench) start warm instead of paying the
# ~160 s cold compile every time
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_MSM_MPOINTS_PER_S = 1.0  # nominal 64-core libff baseline

N_POINTS = int(os.environ.get("BENCH_MSM_N", str(1 << 18)))
CURVE = os.environ.get("BENCH_CURVE", "bls12-377")
WINDOW_C = int(os.environ.get("BENCH_WINDOW_C", "0"))
PHASES_OUT = os.environ.get("BENCH_PHASES", "BENCH_PHASES.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import random

    import jax

    from zecale_tpu.ec import host_curve as hc, msm8
    from zecale_tpu.ff import fp8, params as P
    from zecale_tpu.utils.profiling import PhaseProfiler

    prof = PhaseProfiler()
    log(f"devices: {jax.devices()}")
    r = P.CURVES[CURVE].r
    rng = random.Random(42)
    gen = hc.generators(CURVE)[0]
    crv_h = hc.g1_curve(CURVE)
    c = WINDOW_C or msm8.default_window(N_POINTS)
    random_points = bool(os.environ.get("BENCH_RANDOM_POINTS"))
    scalars = [rng.randrange(r) for _ in range(N_POINTS)]
    if random_points:
        # fully random points via the native fixed-base ladder (fast);
        # oracle-checked against the native Pippenger MSM below
        from zecale_tpu.native import ec as nec

        assert nec.available(), "BENCH_RANDOM_POINTS needs the C engine"
        log(f"building {N_POINTS} RANDOM points (native ladder), c={c}...")
        ks = [rng.randrange(1, r) for _ in range(N_POINTS)]
        pts = nec.NativeCurve(CURVE).fixed_base_mul_batch(ks, gen)
        base_pts = None
    else:
        log(f"building {N_POINTS} points (64 distinct bases cycled), "
            f"c={c}...")
        base_pts = []
        pt = gen
        for _ in range(64):
            base_pts.append(pt)
            pt = crv_h.dbl(pt)
        pts = [base_pts[i % 64] for i in range(N_POINTS)]

    with prof.phase("pack"):
        Fr8 = fp8.field8(r)
        scal8 = Fr8.pack(scalars, mont=False)
        pts_dev = msm8.pack_points_affine8(CURVE, pts)

    # round-4 dense-bucket engine (ec/msm4.py); ZECALE_USE_MSM8=1 falls
    # back to the round-2/3 sort-and-compact engine
    if os.environ.get("ZECALE_USE_MSM8"):
        fn = msm8.msm8_jit(CURVE, False, c)
    else:
        from zecale_tpu.ec import msm4

        plan = msm4.make_plan(CURVE, False, N_POINTS, WINDOW_C)
        log(
            f"msm4 plan: c={plan.c} W={plan.W} K={plan.K} C={plan.C} "
            f"rows={plan.lanes * plan.C / 1e6:.2f}M"
        )
        fn = msm4.msm4_jit(CURVE, False, N_POINTS, WINDOW_C)
    log("compiling MSM kernel (persistent cache applies)...")
    with prof.phase("compile+first"):
        out = fn(scal8, pts_dev)
        _ = np.asarray(out["x"])  # host read = the only reliable fence here
    log(f"compile+first run: {prof.total('compile+first'):.1f}s")

    iters = 3
    variants = [scal8] + [
        Fr8.pack([rng.randrange(r) for _ in range(N_POINTS)], mont=False)
        for _ in range(iters - 1)
    ]
    with prof.phase("steady"):
        t0 = time.time()
        for i in range(iters):
            o = fn(variants[i], pts_dev)
            _ = np.asarray(o["x"])[:1]
        dt = (time.time() - t0) / iters
    mpoints = N_POINTS / dt / 1e6
    log(f"steady-state MSM: {dt*1e3:.0f} ms for {N_POINTS} points")

    # correctness vs exact folded oracle (64 distinct bases).  Fence the
    # device queue first: without it the remaining steady-state transfers
    # land in this phase's wall clock over the remote tunnel (the 11 s
    # "verify regression" flagged by the round-2 advisor was exactly this
    # attribution artifact, not a compute change).
    jax.block_until_ready(out)
    with prof.phase("verify"):
        got = msm8.unpack_jac_point8(CURVE, out)
        if random_points:
            from zecale_tpu.native import ec as nec

            expect = nec.NativeCurve(CURVE).msm(scalars, pts)
        else:
            folded = [0] * 64
            for i, s in enumerate(scalars):
                folded[i % 64] = (folded[i % 64] + s) % r
            expect = crv_h.msm(folded, base_pts)
        ok = got == expect
    log(f"correctness vs host oracle: {ok}")

    # diagnostics: native CPU MSM for scale (stderr only)
    try:
        from zecale_tpu.native import ec as nec

        if nec.available():
            n_cpu = min(N_POINTS, 1 << 14)
            ncv = nec.NativeCurve(CURVE)
            with prof.phase("native_cpu_msm"):
                t0 = time.time()
                ncv.msm(scalars[:n_cpu], pts[:n_cpu])
                cpu_dt = time.time() - t0
            log(
                f"native C MSM (CPU, n={n_cpu}): {cpu_dt*1e3:.0f} ms "
                f"-> {n_cpu/cpu_dt/1e6:.3f} Mpoints/s"
            )
    except Exception as e:  # diagnostics must not fail the bench
        log(f"native CPU diagnostic skipped: {e}")

    prof.report()
    try:
        prof.to_json(PHASES_OUT)
    except Exception:
        pass

    if not ok:
        log("MSM MISMATCH — benchmark invalid")
        return 1

    # second north star: aggregated proofs/s (batch-8 BW6-761 wrapper,
    # warm prove) via scripts/aggregate_e2e.py in a subprocess under a
    # timeout — its failure must not invalidate the MSM headline.
    e2e = None
    if os.environ.get("BENCH_E2E", "1") != "0":
        e2e = _run_e2e()

    out_obj = {
        "metric": f"msm_{CURVE}_g1_mpoints_per_s_per_chip",
        "value": round(mpoints, 4),
        "unit": "Mpoints/s",
        "vs_baseline": round(mpoints / REFERENCE_MSM_MPOINTS_PER_S, 4),
        "engine": "msm8" if os.environ.get("ZECALE_USE_MSM8") else "msm4",
        "points": "random" if random_points else "cycled64",
        "aggregated_proofs_per_s": (
            e2e.get("aggregated_proofs_per_s") if e2e else None
        ),
        "e2e_batch": e2e.get("batch") if e2e else None,
        "e2e_warm_prove_s": e2e.get("warm_prove_s") if e2e else None,
        "e2e_cold_prove_s": e2e.get("cold_prove_s") if e2e else None,
    }
    print(json.dumps(out_obj))
    return 0


def _run_e2e():
    """Run the batch-8 wrapper e2e in a subprocess; return its summary
    dict or None.  BENCH_E2E_BATCH / BENCH_E2E_TIMEOUT resize."""
    import subprocess

    batch = int(os.environ.get("BENCH_E2E_BATCH", "8"))
    tmo = int(os.environ.get("BENCH_E2E_TIMEOUT", "2700"))
    jpath = f"/tmp/zecale_bench_e2e_b{batch}.json"
    try:
        os.remove(jpath)
    except OSError:
        pass
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "scripts", "aggregate_e2e.py"),
        "--batch", str(batch), "--json", jpath,
    ]
    log(f"e2e: running batch-{batch} wrapper prove (timeout {tmo}s)...")
    try:
        res = subprocess.run(
            cmd, timeout=tmo, stdout=sys.stderr, stderr=sys.stderr
        )
        if res.returncode != 0:
            log(f"e2e: FAILED (exit {res.returncode})")
            return None
        with open(jpath) as f:
            summary = json.load(f)
        log(f"e2e: {summary}")
        return summary
    except Exception as e:
        log(f"e2e: skipped ({e})")
        return None


if __name__ == "__main__":
    sys.exit(main())
