"""Pull msm4's assembled bucket partials (W*K, 3ew) off the device and
finish the weighted reduction + Horner on the HOST curve.  Discriminates:
host-finish == native-oracle total  => partials right, device epilogue
(weighted_horner) wrong; mismatch   => reduce/gather/assembly wrong.

Usage: python scripts/r5_partials_check.py [n_log2] [curve]
"""

import os
import sys

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

    cp = P.CURVES[curve]
    r, q = cp.r, cp.q
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
    print(f"plan: c={plan.c} W={plan.W} K={plan.K} C={plan.C}", flush=True)

    # run _msm4_run but stop at partials_full: monkeypatch weighted_horner
    captured = {}
    orig_wh = msm4.weighted_horner

    def capture(plan_, F_, ctx_, partials_cat, as_projective=False):
        captured["p"] = partials_cat
        return orig_wh(plan_, F_, ctx_, partials_cat, as_projective)

    msm4.weighted_horner = capture
    try:
        def run(scal8, pts_aff):
            out = msm4._msm4_run(plan, F, ctx, scal8, pts_aff, False)
            return out, captured["p"]

        out_d, partials_d = bound_jit([F], run)(scal8, pts_dev)
    finally:
        msm4.weighted_horner = orig_wh
    partials = np.asarray(partials_d).astype(np.int64)  # (W*K, 3ew)
    got_dev = msm8.unpack_jac_point8(curve, out_d)

    # host finish: lazy Montgomery limbs -> ints -> projective points
    L = fp8.field8(q).L
    Rinv = pow(1 << (8 * L), q - 2, q)

    def limbs_to_int(row):
        v = 0
        for i in range(len(row) - 1, -1, -1):
            v = (v << 8) | int(row[i])
        return v

    crv = hc.g1_curve(curve)

    def to_jac(row):
        ew = plan.ew
        x = limbs_to_int(row[:ew]) % q
        y = limbs_to_int(row[ew : 2 * ew]) % q
        z = limbs_to_int(row[2 * ew :]) % q
        x, y, z = (
            x * Rinv % q, y * Rinv % q, z * Rinv % q
        )
        if z == 0:
            return None
        # projective (X, Y, Z) -> jacobian-free: affine = (X/Z, Y/Z)
        zi = pow(z, q - 2, q)
        return (x * zi % q, y * zi % q)

    # host signed digits (same recode as the device) folded per base
    W, K, c = plan.W, plan.K, plan.c
    half, full = 1 << (c - 1), 1 << c
    folded_dig = [[0] * 64 for _ in range(W)]
    for i, s in enumerate(scalars):
        carry = 0
        for j in range(W):
            d = ((s >> (c * j)) & (full - 1)) + carry
            carry = 1 if d > half else 0
            if d > half:
                d -= full
            folded_dig[j][i % 64] += d

    total = None
    for j in range(W - 1, -1, -1):
        if total is not None:
            for _ in range(c):
                total = crv.dbl(total)
        # weighted bucket sum for window j via suffix sums
        run_ = None
        acc = None
        for b in range(K - 1, -1, -1):
            p = to_jac(partials[j * K + b])
            if p is not None:
                run_ = p if run_ is None else crv.add(run_, p)
            if run_ is not None:
                acc = run_ if acc is None else crv.add(acc, run_)
        exp_j = ncv.msm([d % r for d in folded_dig[j]], base)
        if acc != exp_j:
            print(f"  window {j}: partials weighted sum WRONG", flush=True)
        if acc is not None:
            total = acc if total is None else crv.add(total, acc)

    folded = [0] * 64
    for i, s in enumerate(scalars):
        folded[i % 64] = (folded[i % 64] + s) % r
    expect = ncv.msm(folded, base)
    host_fin = total
    print("host-finish == oracle:", host_fin == expect, flush=True)
    print("device out  == oracle:", got_dev == expect, flush=True)
    if host_fin != expect:
        print("  -> partials are WRONG (reduce/gather/assembly)")
    elif got_dev != expect:
        print("  -> partials right; device weighted_horner is WRONG")
    return 0


if __name__ == "__main__":
    sys.exit(main())
