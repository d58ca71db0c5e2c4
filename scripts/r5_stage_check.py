"""Stage-by-stage device-vs-host validation of the msm4 jnp pipeline at
the failing BW6 2^18 shape: digits/keys/sort/counts exactly vs numpy,
_padded_src index invariants, and SAMPLED rows of the big int8 table
gather vs a host numpy gather of the same indices.

Usage: python scripts/r5_stage_check.py [n_log2] [curve]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_zecale")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import random

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from zecale_tpu.ec import host_curve as hc, msm4, msm8
    from zecale_tpu.ff import fp8
    from zecale_tpu.ff import params as P
    from zecale_tpu.native import ec as nec
    from zecale_tpu.utils.jit_utils import bound_jit

    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    curve = sys.argv[2] if len(sys.argv) > 2 else "bw6-761"
    n = 1 << nlog
    print("devices:", jax.devices(), flush=True)

    r = P.CURVES[curve].r
    rng = random.Random(99)
    gen = hc.generators(curve)[0]
    ncv = nec.NativeCurve(curve)
    ks = [rng.randrange(1, r) for _ in range(64)]
    base = ncv.fixed_base_mul_batch(ks, gen)
    pts = [base[i % 64] for i in range(n)]
    scalars = [rng.randrange(r) for _ in range(n)]

    Fr8 = fp8.field8(r)
    scal8 = Fr8.pack([s % r for s in scalars], mont=False)
    pts_dev = msm8.pack_points_affine8(curve, pts)

    plan = msm4.make_plan(curve, False, n, 0)
    F, ctx = msm4._field_ctx(curve, plan.fq2)
    nbits = r.bit_length()
    print(f"plan: c={plan.c} W={plan.W} K={plan.K} C={plan.C}", flush=True)

    # ---- stage 1: digits/keys/sort/counts (device) vs numpy ------------
    def stage1(scal8, pts_aff):
        buckets, signs = msm8.signed_digits_from_limbs8(
            scal8, nbits, plan.c
        )
        keys = msm4._build_keys(plan, buckets, signs, pts_aff["inf"])
        skeys = jnp.sort(keys, axis=1)
        starts, counts = msm4._starts_counts(plan, skeys)
        return skeys, starts, counts

    skeys_d, starts_d, counts_d = bound_jit([F], stage1)(scal8, pts_dev)
    skeys_d = np.asarray(skeys_d)
    starts_d = np.asarray(starts_d)
    counts_d = np.asarray(counts_d)

    # host reference: signed digits of each scalar
    W, c, n2 = plan.W, plan.c, plan.n2
    keys_h = np.full((W, n2), 0x7FFFFFFF, dtype=np.int64)
    for i, s in enumerate(scalars):
        carry = 0
        for j in range(W):
            d = ((s >> (c * j)) & ((1 << c) - 1)) + carry
            carry = 0
            if d > (1 << (c - 1)):
                d -= 1 << c
                carry = 1
            if d != 0:
                sign = 1 if d < 0 else 0
                b = (-d if d < 0 else d) - 1
                keys_h[j, i] = (b << plan.shift) | (sign << plan.logn) | i
    skeys_h = np.sort(keys_h, axis=1).astype(np.int64)
    ok1 = (skeys_h == skeys_d.astype(np.int64)).all()
    print(f"stage1 skeys match: {ok1}", flush=True)
    bounds = (np.arange(plan.K + 1, dtype=np.int64) << plan.shift)
    starts_h = np.stack(
        [np.searchsorted(skeys_h[j], bounds, side="left")
         for j in range(W)]
    )
    ok1b = (starts_h == starts_d).all()
    ok1c = ((starts_h[:, 1:] - starts_h[:, :-1]) == counts_d).all()
    print(f"stage1 starts/counts match: {ok1b} {ok1c}", flush=True)

    # ---- stage 2: padded src indices (device) vs host replica ----------
    def stage2(scal8, pts_aff):
        skeys, starts, counts = stage1(scal8, pts_aff)
        return msm4._padded_src(
            plan, skeys, starts, counts, jnp.int32(0)
        )

    src_d = np.asarray(bound_jit([F], stage2)(scal8, pts_dev))
    # host replica for the FLAT windows (contiguous runs)
    mask = (1 << plan.shift) - 1
    idrow = 2 * plan.n2
    C = plan.C
    off = 0
    ok2 = True
    for j in range(plan.W):
        span = plan.win_lanes(plan.win_shapes[j]) * C
        blk = src_d[off : off + span]
        if j in plan.reg_wins:
            exp = np.full((plan.K, C), idrow, dtype=np.int64)
            for b in range(plan.K):
                s0 = starts_h[j, b]
                cnt = starts_h[j, b + 1] - s0
                take = min(cnt, C)
                exp[b, :take] = skeys_h[j, s0 : s0 + take] & mask
            if not (exp.reshape(-1) == blk.astype(np.int64)).all():
                bad = np.nonzero(exp.reshape(-1) != blk)[0][:5]
                print(f"stage2 FLAT window {j} MISMATCH at {bad}",
                      flush=True)
                ok2 = False
        off += span
    print(f"stage2 flat-window src match: {ok2}", flush=True)

    # ---- stage 3: sampled gather rows vs host numpy gather -------------
    def stage3(scal8, pts_aff):
        skeys, starts, counts = stage1(scal8, pts_aff)
        table = msm4._table_int8(plan, F, pts_aff)
        lo, hi = 0, plan.W
        src = msm4._padded_src(plan, skeys, starts, counts,
                               jnp.int32(0))
        mat = table[src]
        return table, src, mat

    table_d, src_d2, mat_d = bound_jit([F], stage3)(scal8, pts_dev)
    table_h = np.asarray(table_d)
    src_h = np.asarray(src_d2)
    samp = np.asarray(
        random.Random(5).sample(range(src_h.shape[0]), 4096)
    )
    mat_s = np.asarray(mat_d[jnp.asarray(samp)])
    exp_s = table_h[src_h[samp]]
    ok3 = (mat_s == exp_s).all()
    print(f"stage3 sampled gather rows match: {ok3}", flush=True)
    if not ok3:
        bad = np.nonzero((mat_s != exp_s).any(axis=1))[0]
        print(f"  bad sample rows: {len(bad)} of 4096; first at "
              f"src index {samp[bad[0]]}", flush=True)

    return 0


if __name__ == "__main__" and not (
    len(sys.argv) > 1 and sys.argv[1] == "dump"
):
    sys.exit(main())


def dump_window0():
    import jax
    import jax.numpy as jnp

    from zecale_tpu.ec import host_curve as hc, msm4, msm8
    from zecale_tpu.ff import fp8
    from zecale_tpu.ff import params as P
    from zecale_tpu.native import ec as nec
    from zecale_tpu.utils.jit_utils import bound_jit

    nlog, curve = 18, "bw6-761"
    n = 1 << nlog
    r = P.CURVES[curve].r
    rng = random.Random(99)
    gen = hc.generators(curve)[0]
    ncv = nec.NativeCurve(curve)
    ks = [rng.randrange(1, r) for _ in range(64)]
    base = ncv.fixed_base_mul_batch(ks, gen)
    pts = [base[i % 64] for i in range(n)]
    scalars = [rng.randrange(r) for _ in range(n)]
    Fr8 = fp8.field8(r)
    scal8 = Fr8.pack([s % r for s in scalars], mont=False)
    pts_dev = msm8.pack_points_affine8(curve, pts)
    plan = msm4.make_plan(curve, False, n, 0)
    F, _ = msm4._field_ctx(curve, plan.fq2)
    nbits = r.bit_length()

    def stage(scal8, pts_aff, lo, hi):
        buckets, signs = msm8.signed_digits_from_limbs8(
            scal8, nbits, plan.c
        )
        keys = msm4._build_keys(plan, buckets, signs, pts_aff["inf"])
        skeys = jnp.sort(keys, axis=1)
        starts, counts = msm4._starts_counts(plan, skeys)
        src = msm4._padded_src(plan, skeys, starts, counts,
                               jnp.int32(0), (lo, hi))
        return skeys, starts, counts, src

    # full range (as the failing check) AND the production group range
    for (lo, hi) in [(0, plan.W), (0, 9)]:
        skeys, starts, counts, src = bound_jit(
            [F], lambda a, b, lo=lo, hi=hi: stage(a, b, lo, hi)
        )(scal8, pts_dev)
        skeys = np.asarray(skeys)
        starts = np.asarray(starts)
        src = np.asarray(src)
        C = plan.C
        mask = (1 << plan.shift) - 1
        print(f"win_range ({lo},{hi}):", flush=True)
        print("  dev src[0:8]  =", src[:8], flush=True)
        exp = skeys[0, starts[0, 0] : starts[0, 0] + 8] & mask
        print("  exp (host)    =", exp, "count0 =",
              int(counts[0, 0]), "start0 =", int(starts[0, 0]),
              flush=True)
        print("  dev src[C:C+8]=", src[C : C + 8], flush=True)
        print("  exp bucket1   =",
              skeys[0, starts[0, 1] : starts[0, 1] + 8] & mask,
              flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "dump":
    dump_window0()
    sys.exit(0)
