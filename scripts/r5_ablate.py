"""Round-5 stage ablation for the msm4 pipeline on the real chip.

Times cumulative prefixes of _msm4_run so the deltas attribute the
steady-state wall clock to: prologue (digits/keys/sort/counts), matrix
build (padded gather + transpose), Pallas bucket reduce, sub-lane fold +
assembly, and the weighted-Horner epilogue.

Usage: python scripts/r5_ablate.py [n_log2] [curve] [stage...]
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
    import jax.numpy as jnp

    from zecale_tpu.ec import host_curve as hc, msm4, msm8
    from zecale_tpu.ff import fp8, fp8q
    from zecale_tpu.ff import params as P
    from zecale_tpu.utils.jit_utils import bound_jit

    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    curve = sys.argv[2] if len(sys.argv) > 2 else "bls12-377"
    stages = sys.argv[3:] or ["prologue", "matrix", "reduce", "full"]
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
    scal8 = Fr8.pack(scalars, mont=False)
    pts_dev = msm8.pack_points_affine8(curve, pts)

    plan = msm4.make_plan(curve, False, n, 0)
    F, ctx = msm4._field_ctx(curve, plan.fq2)
    nbits = r.bit_length()
    print(
        f"plan: c={plan.c} W={plan.W} K={plan.K} C={plan.C} B0={plan.B0} "
        f"lanes={plan.lanes} rows={plan.lanes*plan.C/1e6:.2f}M",
        flush=True,
    )

    def prologue(scal8, pts_aff):
        buckets, signs = msm8.signed_digits_from_limbs8(scal8, nbits, plan.c)
        keys = msm4._build_keys(plan, buckets, signs, pts_aff["inf"])
        skeys = jnp.sort(keys, axis=1)
        starts, counts = msm4._starts_counts(plan, skeys)
        return skeys, starts, counts

    def matrix(scal8, pts_aff):
        skeys, starts, counts = prologue(scal8, pts_aff)
        table = msm4._table_int8(plan, F, pts_aff)
        src = msm4._padded_src(plan, skeys, starts, counts, jnp.int32(0))
        mat = (
            table[src]
            .reshape(plan.lanes, plan.C, 2 * plan.ew)
            .transpose(1, 2, 0)
        )
        return mat

    def reduce_stage(scal8, pts_aff):
        skeys, starts, counts = prologue(scal8, pts_aff)
        table = msm4._table_int8(plan, F, pts_aff)
        src = msm4._padded_src(plan, skeys, starts, counts, jnp.int32(0))
        mat = (
            table[src]
            .reshape(plan.lanes, plan.C, 2 * plan.ew)
            .transpose(1, 2, 0)
        )
        needs = msm4._lane_needs(plan, counts, jnp.int32(0))
        GL = msm4.GL
        pad_g = -(-plan.lanes // GL) * GL
        if pad_g != plan.lanes:
            mat = jnp.pad(mat, ((0, 0), (0, 0), (0, pad_g - plan.lanes)))
            needs = jnp.pad(needs, (0, pad_g - plan.lanes))
        block_need = jnp.max(needs.reshape(-1, GL), axis=1).astype(jnp.int32)
        return msm4.bucket_reduce_pallas(plan, F, ctx, mat, block_need)

    def full(scal8, pts_aff):
        return msm4._msm4_run(plan, F, ctx, scal8, pts_aff, True)

    fns = {
        "prologue": prologue,
        "matrix": matrix,
        "reduce": reduce_stage,
        "full": full,
    }
    binders = [F] + ([ctx] if ctx else [])
    prev = 0.0
    for name in stages:
        fn = bound_jit(binders, fns[name])
        t0 = time.time()
        out = fn(scal8, pts_dev)
        jax.block_until_ready(out)
        compile_t = time.time() - t0
        iters = 3
        t0 = time.time()
        for _ in range(iters):
            out = fn(scal8, pts_dev)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        print(
            f"{name:10s}: steady {dt*1e3:8.1f} ms  (delta "
            f"{(dt-prev)*1e3:8.1f} ms, compile+first {compile_t:.1f}s)",
            flush=True,
        )
        prev = dt
    return 0


if __name__ == "__main__":
    sys.exit(main())
