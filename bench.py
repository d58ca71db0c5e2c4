"""Benchmark driver — runs on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json north star): MSM throughput per chip on
BLS12-377 G1 (the dominant prover kernel).  The reference publishes no
numbers (README.md:9; BASELINE.md) — ``vs_baseline`` is measured against a
nominal 1.0 Mpoints/s for the reference's libff Pippenger on a 64-core host
(typical libff-era throughput for 253-bit scalars on BLS12-377), documented
here for reproducibility.

Extra diagnostic lines go to stderr to keep stdout a single JSON line.
"""

import json
import os
import sys
import time

REFERENCE_MSM_MPOINTS_PER_S = 1.0  # nominal 64-core libff baseline

N_POINTS = int(os.environ.get("BENCH_MSM_N", "4096"))
CURVE = os.environ.get("BENCH_CURVE", "bls12-377")
WINDOW_C = int(os.environ.get("BENCH_WINDOW_C", "8"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import random

    import jax

    from zecale_tpu.ec import host_curve as hc, msm_tpu
    from zecale_tpu.ff import params as P

    log(f"devices: {jax.devices()}")
    r = P.CURVES[CURVE].r
    rng = random.Random(42)
    gen = hc.generators(CURVE)[0]
    crv_h = hc.g1_curve(CURVE)
    log(f"building {N_POINTS} random points (host)...")
    # random multiples of the generator via cheap doubling chain
    base_pts = []
    pt = gen
    for _ in range(64):
        base_pts.append(pt)
        pt = crv_h.dbl(pt)
    pts = [base_pts[i % 64] for i in range(N_POINTS)]
    scalars = [rng.randrange(r) for _ in range(N_POINTS)]

    digits = msm_tpu.scalar_digit_planes(scalars, r.bit_length(), WINDOW_C)
    pts_dev = msm_tpu.pack_g1_points(CURVE, pts)

    fn = msm_tpu.msm_jit(CURVE, False, WINDOW_C)
    log("compiling MSM kernel...")
    t0 = time.time()
    out = fn(digits, pts_dev)
    jax.block_until_ready(out)
    log(f"compile+first run: {time.time() - t0:.1f}s")

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = fn(digits, pts_dev)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    mpoints = N_POINTS / dt / 1e6
    log(f"steady-state MSM: {dt:.3f}s for {N_POINTS} points")

    # correctness spot check vs host oracle
    got = msm_tpu.unpack_g1_point(CURVE, out)
    expect = crv_h.msm(scalars[:0] + scalars, pts)  # full host MSM
    ok = got == expect
    log(f"correctness vs host oracle: {ok}")
    if not ok:
        log("MSM MISMATCH — benchmark invalid")
        return 1

    print(
        json.dumps(
            {
                "metric": f"msm_{CURVE}_g1_mpoints_per_s_per_chip",
                "value": round(mpoints, 4),
                "unit": "Mpoints/s",
                "vs_baseline": round(
                    mpoints / REFERENCE_MSM_MPOINTS_PER_S, 4
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
