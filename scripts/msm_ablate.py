"""Ablation timing for the msm8 pipeline on the real chip.

Times, as separate jits (same shapes as bench.py n=2^18, c=13):
  A. digit extraction + composite-key build + argsort + source gathers
     (everything before the combining rounds);
  B. A + the first (affine) combining round;
  C. the full MSM (reference point, same graph as bench.py).

This attributes the steady-state seconds between data movement
(sort/gather), the wide affine round, and the rest (jac rounds +
reduction + Horner), guiding which lever to pull next (NOTES_ROUND3).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_zecale")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import random

import jax
import jax.numpy as jnp
import numpy as np

from zecale_tpu.ec import ec_pallas, host_curve as hc, msm8
from zecale_tpu.ff import fp8, params as P
from zecale_tpu.utils.jit_utils import bound_jit

CURVE = "bls12-377"
N = int(os.environ.get("ABL_N", str(1 << 18)))
C = int(os.environ.get("ABL_C", "0")) or msm8.default_window(N)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    r = P.CURVES[CURVE].r
    rng = random.Random(42)
    gen = hc.generators(CURVE)[0]
    crv_h = hc.g1_curve(CURVE)
    base = []
    pt = gen
    for _ in range(64):
        base.append(pt)
        pt = crv_h.dbl(pt)
    pts = [base[i % 64] for i in range(N)]
    scalars = [rng.randrange(r) for _ in range(N)]
    Fr8 = fp8.field8(r)
    scal8 = Fr8.pack(scalars, mont=False)
    pts_dev = msm8.pack_points_affine8(CURVE, pts)
    nbits = r.bit_length()

    crv = ec_pallas.PallasProjCurve(CURVE, bt=ec_pallas.DEFAULT_BT)
    F = crv.F

    def prologue(scal8, pts_aff):
        # shared helper: times exactly the graph msm8_core runs
        buckets, signs = msm8.signed_digits_from_limbs8(scal8, nbits, C)
        return msm8._build_sorted_affine(F, buckets, signs, pts_aff, C)

    def prologue_sum(scal8, pts_aff):
        # reduce outputs so the ablation jit doesn't materialize the ~1 GB
        # gathered coordinate arrays through HBM outputs (the real MSM
        # graph consumes them fused)
        keys, aff = prologue(scal8, pts_aff)
        return (
            jnp.sum(keys),
            jnp.sum(aff["x"], axis=0),
            jnp.sum(aff["y"], axis=0),
        )

    def round1(scal8, pts_aff):
        keys, aff = prologue(scal8, pts_aff)
        sizes = msm8._round_schedule(keys.shape[0],
                                     (keys.shape[0] // N) * (1 << (C - 1)))
        # points travel in the concatenated-coordinate form (msm8._cat_pt)
        ks, cat = msm8._combine_round(
            crv, keys, msm8._from_affine_cat(crv, aff),
            sizes[0] if sizes else keys.shape[0],
        )
        return jnp.sum(ks), jnp.sum(cat, axis=0)

    fa = bound_jit([F], prologue_sum)
    fb = bound_jit([F], round1)
    fc = msm8.msm8_jit(CURVE, False, C)

    def timeit(name, fn, k=3):
        o = fn(scal8, pts_dev)
        leaf = jax.tree_util.tree_leaves(o)[0]
        _ = np.asarray(leaf).ravel()[:1]
        t0 = time.time()
        for _ in range(k):
            o = fn(scal8, pts_dev)
            leaf = jax.tree_util.tree_leaves(o)[0]
            _ = np.asarray(leaf).ravel()[:1]
        dt = (time.time() - t0) / k
        log(f"{name}: {dt*1e3:.0f} ms")
        return dt

    ta = timeit("A prologue (digits+sort+gather)", fa)
    tb = timeit("B prologue + affine round 1", fb)
    tc = timeit("C full MSM", fc)
    log(f"affine round 1 alone: {(tb-ta)*1e3:.0f} ms")
    log(f"jac rounds + reduction + horner: {(tc-tb)*1e3:.0f} ms")


if __name__ == "__main__":
    sys.exit(main())
