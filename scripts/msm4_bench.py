"""Chip benchmark for the round-4 dense-bucket MSM engine (ec/msm4.py).

Usage: python scripts/msm4_bench.py [n_log2] [curve] [c]
Prints steady-state Mpoints/s + correctness vs the folded host oracle,
with the same tunnel-aware fencing as bench.py (host read of one lane).
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


def main():
    import jax

    from zecale_tpu.ec import host_curve as hc, msm4, msm8
    from zecale_tpu.ff import fp8
    from zecale_tpu.ff import params as P

    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    curve = sys.argv[2] if len(sys.argv) > 2 else "bls12-377"
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    n = 1 << nlog
    print("devices:", jax.devices(), flush=True)

    r = P.CURVES[curve].r
    rng = random.Random(42)
    gen = hc.generators(curve)[0]
    crv_h = hc.g1_curve(curve)
    base = []
    pt = gen
    for _ in range(64):
        base.append(pt)
        pt = crv_h.dbl(pt)
    pts = [base[i % 64] for i in range(n)]
    scalars = [rng.randrange(r) for _ in range(n)]
    Fr8 = fp8.field8(r)

    t0 = time.time()
    scal8 = Fr8.pack(scalars, mont=False)
    pts_dev = msm8.pack_points_affine8(curve, pts)
    print(f"pack: {time.time()-t0:.1f}s", flush=True)

    plan = msm4.make_plan(curve, False, n, c)
    print(
        f"plan: c={plan.c} W={plan.W} K={plan.K} C={plan.C} "
        f"G={plan.G} B0={plan.B0} rows={plan.W*plan.K*plan.C/1e6:.2f}M "
        f"(lf={plan.W*plan.K*plan.C/(plan.W*plan.n2):.2f})",
        flush=True,
    )
    fn = msm4.msm4_jit(curve, False, n, c)
    t0 = time.time()
    out = fn(scal8, pts_dev)
    _ = np.asarray(out["x"])
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

    iters = 3
    variants = [scal8] + [
        Fr8.pack([rng.randrange(r) for _ in range(n)], mont=False)
        for _ in range(iters - 1)
    ]
    t0 = time.time()
    for i in range(iters):
        o = fn(variants[i], pts_dev)
        _ = np.asarray(o["x"]).ravel()[:1]
    dt = (time.time() - t0) / iters
    print(
        f"steady: {dt*1e3:.0f} ms -> {n/dt/1e6:.4f} Mpoints/s",
        flush=True,
    )

    got = msm8.unpack_jac_point8(curve, out)
    folded = [0] * 64
    for i, s in enumerate(scalars):
        folded[i % 64] = (folded[i % 64] + s) % r
    expect = crv_h.msm(folded, base)
    print("correct:", got == expect, flush=True)
    return 0 if got == expect else 1


if __name__ == "__main__":
    sys.exit(main())
