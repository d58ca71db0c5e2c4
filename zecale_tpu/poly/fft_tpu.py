"""Radix-2 FFT over prime scalar fields on the JAX/TPU path.

Replaces libfqfft's basic_radix2_domain (SURVEY.md section 2b) with an
iterative, shape-static butterfly network over Montgomery limb planes:

  * values: (n, L) int32 Montgomery-form limb arrays;
  * per-stage twiddles precomputed on host, packed once per (n, field);
  * bit-reversal as a single static gather;
  * each stage is one vectorized butterfly (n/2 Montgomery muls).

The distributed (multi-chip) variant lives in
zecale_tpu/parallel/fft_dist.py: DIF/DIT split (no runtime bit-reversal)
with cross-shard butterfly stages as explicit ppermute half-exchanges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import fp_jax
from ..ff import limb as lb
from ..poly import domain_host


@functools.lru_cache(maxsize=None)
def _plan(n: int, r: int, inverse: bool):
    """Host-side FFT plan: bit-reversal permutation + per-stage twiddles
    (Montgomery form, packed)."""
    d = domain_host.domain(n, r)
    assert getattr(d, "C", 1) == 1, (
        "TPU FFT plans are radix-2 only; domains beyond the field's "
        "2-adicity (extended coset-union domains, e.g. MNT6-298 above 2^17 "
        "constraints) run on the native prover (Groth16Native) — see "
        "KNOWN_GAPS"
    )
    omega = d.omega_inv if inverse else d.omega
    mp = lb.mont_params(r)
    # bit reversal permutation
    bits = n.bit_length() - 1
    rev = np.zeros(n, dtype=np.int32)
    for i in range(n):
        rev[i] = int(bin(i)[2:].zfill(bits)[::-1], 2)
    # stage twiddles: stage s has half = 2^s butterflies per block,
    # twiddle w_s^j for j in [0, half), w_s = omega^(n / 2^(s+1))
    stage_tw = []
    for s in range(bits):
        half = 1 << s
        w = pow(omega, n // (2 * half), r)
        tws = []
        cur = 1
        for _ in range(half):
            tws.append(cur * mp.r_mod_p % r)  # Montgomery form
            cur = cur * w % r
        # tile the half-length twiddle vector across n/2 butterfly lanes
        reps = (n // 2) // half
        stage_tw.append(
            np.tile(
                lb.batch_to_limbs(tws, mp.L).astype(np.int32), (reps, 1)
            )
        )
    size_inv_mont = pow(n, r - 2, r) * mp.r_mod_p % r
    # cache numpy only (tracer-leak safety)
    return (
        rev,
        stage_tw,
        lb.to_limbs(size_inv_mont, mp.L).astype(np.int32),
    )


def plan_arrays(n: int, r: int, inverse: bool):
    """Device-ready plan pytree (pass as a jit ARGUMENT -- embedding the
    twiddles as literals hangs the axon compiler's constant folding)."""
    rev_np, stage_tw_np, size_inv_np = _plan(n, r, inverse)
    return {
        "rev": jnp.asarray(rev_np),
        "tw": [jnp.asarray(t) for t in stage_tw_np],
        "sinv": jnp.asarray(size_inv_np),
    }


def fft(values, r: int, inverse: bool = False, plan=None):
    """In-domain FFT/iFFT of Montgomery-form values, shape (n, L)."""
    F = fp_jax.field(r)
    n = values.shape[0]
    if plan is None:
        plan = plan_arrays(n, r, inverse)
    rev = plan["rev"]
    stage_tw = plan["tw"]
    size_inv = plan["sinv"]
    a = values[rev]
    bits = n.bit_length() - 1
    for s in range(bits):
        half = 1 << s
        # group into blocks of 2*half; lanes = n/2 butterflies
        a_blocks = a.reshape(n // (2 * half), 2 * half, F.L)
        u = a_blocks[:, :half, :].reshape(n // 2, F.L)
        v = a_blocks[:, half:, :].reshape(n // 2, F.L)
        tv = F.mont_mul(v, stage_tw[s].reshape(n // 2, F.L))
        lo = F.add(u, tv)
        hi = F.sub(u, tv)
        a = jnp.concatenate(
            [
                lo.reshape(n // (2 * half), half, F.L),
                hi.reshape(n // (2 * half), half, F.L),
            ],
            axis=1,
        ).reshape(n, F.L)
    if inverse:
        a = F.mont_mul(a, jnp.broadcast_to(size_inv, a.shape))
    return a


@functools.lru_cache(maxsize=None)
def _coset_scale(n: int, r: int, inverse: bool):
    d = domain_host.domain(n, r)
    mp = lb.mont_params(r)
    g = (
        pow(d.coset_shift, r - 2, r)
        if inverse
        else d.coset_shift
    )
    vals = []
    cur = 1
    for _ in range(n):
        vals.append(cur * mp.r_mod_p % r)
        cur = cur * g % r
    return lb.batch_to_limbs(vals, mp.L).astype(np.int32)


def coset_scale_array(n: int, r: int, inverse: bool):
    return jnp.asarray(_coset_scale(n, r, inverse))


def coset_fft(coeffs, r: int, plan=None, scale=None):
    F = fp_jax.field(r)
    n = coeffs.shape[0]
    if scale is None:
        scale = coset_scale_array(n, r, False)
    shifted = F.mont_mul(coeffs, scale)
    return fft(shifted, r, inverse=False, plan=plan)


def coset_ifft(evals, r: int, plan=None, scale=None):
    F = fp_jax.field(r)
    n = evals.shape[0]
    if scale is None:
        scale = coset_scale_array(n, r, True)
    coeffs = fft(evals, r, inverse=True, plan=plan)
    return F.mont_mul(coeffs, scale)


# ---------------------------------------------------------------------------
# jit entry (constants-as-arguments protocol)
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.lru_cache(maxsize=None)
def h_pipeline_jit(n: int, r: int):
    """Cached jitted QAP-division pipeline:
    (az, bz, cz evals) -> H coefficients, all Montgomery (n, L)."""
    from ..utils.jit_utils import bound_jit

    F = fp_jax.field(r)

    def run(az, bz, cz, zinv, fplan, iplan, fscale, iscale):
        a_c = fft(az, r, inverse=True, plan=iplan)
        b_c = fft(bz, r, inverse=True, plan=iplan)
        c_c = fft(cz, r, inverse=True, plan=iplan)
        a_e = coset_fft(a_c, r, plan=fplan, scale=fscale)
        b_e = coset_fft(b_c, r, plan=fplan, scale=fscale)
        c_e = coset_fft(c_c, r, plan=fplan, scale=fscale)
        h_e = F.mont_mul(
            F.sub(F.mont_mul(a_e, b_e), c_e),
            jnp.broadcast_to(zinv, a_e.shape),
        )
        return coset_ifft(h_e, r, plan=iplan, scale=iscale)

    inner = bound_jit([F], run)
    fplan = plan_arrays(n, r, False)
    iplan = plan_arrays(n, r, True)
    fscale = coset_scale_array(n, r, False)
    iscale = coset_scale_array(n, r, True)
    from ..ff import limb as _lb
    from ..poly.domain_host import domain as _dom
    import numpy as _np

    d = _dom(n, r)
    mp = _lb.mont_params(r)
    zinv = jnp.asarray(
        _lb.to_limbs(
            d.vanishing_on_coset_inverse() * mp.r_mod_p % r, F.L
        ).astype(_np.int32)
    )

    def call(az, bz, cz):
        return inner(az, bz, cz, zinv, fplan, iplan, fscale, iscale)

    return call


@_functools.lru_cache(maxsize=None)
def qap_polys_pipeline_jit(n: int, r: int):
    """Cached jitted pipeline: (az, bz, cz evals) -> (H, A, B) coefficient
    arrays, all Montgomery (n, L).

    Same QAP division as h_pipeline_jit, additionally returning the A(x)/B(x)
    coefficient vectors the PGHR13 prover needs for its zero-knowledge shift
    H'(x) = H(x) + d2 A(x) + d1 B(x) + d1 d2 Z(x) - d3
    (zecale_tpu/snark/pghr13.py prove())."""
    from ..utils.jit_utils import bound_jit

    F = fp_jax.field(r)

    def run(az, bz, cz, zinv, fplan, iplan, fscale, iscale):
        a_c = fft(az, r, inverse=True, plan=iplan)
        b_c = fft(bz, r, inverse=True, plan=iplan)
        c_c = fft(cz, r, inverse=True, plan=iplan)
        a_e = coset_fft(a_c, r, plan=fplan, scale=fscale)
        b_e = coset_fft(b_c, r, plan=fplan, scale=fscale)
        c_e = coset_fft(c_c, r, plan=fplan, scale=fscale)
        h_e = F.mont_mul(
            F.sub(F.mont_mul(a_e, b_e), c_e),
            jnp.broadcast_to(zinv, a_e.shape),
        )
        return coset_ifft(h_e, r, plan=iplan, scale=iscale), a_c, b_c

    inner = bound_jit([F], run)
    fplan = plan_arrays(n, r, False)
    iplan = plan_arrays(n, r, True)
    fscale = coset_scale_array(n, r, False)
    iscale = coset_scale_array(n, r, True)
    from ..ff import limb as _lb
    from ..poly.domain_host import domain as _dom
    import numpy as _np

    d = _dom(n, r)
    mp = _lb.mont_params(r)
    zinv = jnp.asarray(
        _lb.to_limbs(
            d.vanishing_on_coset_inverse() * mp.r_mod_p % r, F.L
        ).astype(_np.int32)
    )

    def call(az, bz, cz):
        return inner(az, bz, cz, zinv, fplan, iplan, fscale, iscale)

    return call
