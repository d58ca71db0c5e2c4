"""On-chip differential check of the calibrated msm4 path against the
native C oracle — the exact configuration the batch-8 wrapper prover runs
(witness-like bit-heavy scalars, per-circuit calibration, window-group
chunking), which the MSM bench's uniform scalars never exercise.

Usage: python scripts/r5_msm_check.py [n_log2] [curve] [dist] [calib01]
  dist: witness | uniform | equal
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_zecale")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import random

import numpy as np


def witness_scalars(rng, r, n):
    out = []
    for _ in range(n):
        roll = rng.random()
        if roll < 0.45:
            out.append(1)
        elif roll < 0.62:
            out.append(0)
        elif roll < 0.8:
            out.append(rng.randrange(2, 1 << 16))
        else:
            out.append(rng.randrange(r))
    return out


def main():
    import jax

    from zecale_tpu.ec import host_curve as hc, msm4, msm8
    from zecale_tpu.ff import fp8
    from zecale_tpu.ff import params as P
    from zecale_tpu.native import ec as nec

    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    curve = sys.argv[2] if len(sys.argv) > 2 else "bw6-761"
    dist = sys.argv[3] if len(sys.argv) > 3 else "witness"
    use_calib = (sys.argv[4] != "0") if len(sys.argv) > 4 else True
    n = 1 << nlog
    print("devices:", jax.devices(), flush=True)

    r = P.CURVES[curve].r
    rng = random.Random(99)
    gen = hc.generators(curve)[0]
    ncv = nec.NativeCurve(curve)
    ks = [rng.randrange(1, r) for _ in range(64)]
    base = ncv.fixed_base_mul_batch(ks, gen)
    pts = [base[i % 64] for i in range(n)]
    if dist == "witness":
        scalars = witness_scalars(rng, r, n)
    elif dist == "equal":
        scalars = [0x123456789ABCDEF % r] * n
    else:
        scalars = [rng.randrange(r) for _ in range(n)]

    Fr8 = fp8.field8(r)
    scal8 = Fr8.pack([s % r for s in scalars], mont=False)
    pts_dev = msm8.pack_points_affine8(curve, pts)

    calib = ()
    if use_calib:
        t0 = time.time()
        calib = msm4.calibrate_slanes(curve, False, n, scal8)
        print(f"calibrated in {time.time()-t0:.1f}s", flush=True)
    plan = msm4.make_plan(curve, False, n, 0, calib)
    print(
        f"plan: c={plan.c} W={plan.W} K={plan.K} C={plan.C} B0={plan.B0} "
        f"lanes={plan.lanes} skew={plan.skew_wins} reg_runs="
        f"{plan.reg_wins[:3]}..{plan.reg_wins[-3:]}",
        flush=True,
    )

    fn = msm4.msm4_jit(curve, False, n, 0, None, calib)
    t0 = time.time()
    out = fn(scal8, pts_dev)
    jax.block_until_ready(out["x"])
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    got = msm8.unpack_jac_point8(curve, out)

    t0 = time.time()
    # fold per distinct base for a cheap exact oracle
    folded = [0] * 64
    for i, s in enumerate(scalars):
        folded[i % 64] = (folded[i % 64] + s) % r
    expect = ncv.msm(folded, base)
    print(f"native oracle: {time.time()-t0:.1f}s", flush=True)
    ok = got == expect
    print(f"MATCH: {ok}", flush=True)
    if not ok:
        print("got:   ", got, flush=True)
        print("expect:", expect, flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
