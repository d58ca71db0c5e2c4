"""Radix-2 FFT over prime scalar fields on the JAX/TPU path.

Replaces libfqfft's basic_radix2_domain (SURVEY.md section 2b) with an
iterative, shape-static butterfly network over Montgomery limb planes:

  * values: (n, L) int32 Montgomery-form limb arrays;
  * per-stage twiddles precomputed on host, packed once per (n, field);
  * bit-reversal as a single static gather;
  * each stage is one vectorized butterfly (n/2 Montgomery muls).

The distributed (multi-chip) variant shards the value axis and runs
cross-shard stages via collectives — see zecale_tpu/parallel/fft_sharded.py.
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


def fft(values, r: int, inverse: bool = False):
    """In-domain FFT/iFFT of Montgomery-form values, shape (n, L)."""
    F = fp_jax.field(r)
    n = values.shape[0]
    rev_np, stage_tw_np, size_inv_np = _plan(n, r, inverse)
    rev = jnp.asarray(rev_np)
    stage_tw = [jnp.asarray(t) for t in stage_tw_np]
    size_inv = jnp.asarray(size_inv_np)
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


def coset_fft(coeffs, r: int):
    F = fp_jax.field(r)
    n = coeffs.shape[0]
    shifted = F.mont_mul(coeffs, jnp.asarray(_coset_scale(n, r, False)))
    return fft(shifted, r, inverse=False)


def coset_ifft(evals, r: int):
    F = fp_jax.field(r)
    n = evals.shape[0]
    coeffs = fft(evals, r, inverse=True)
    return F.mont_mul(coeffs, jnp.asarray(_coset_scale(n, r, True)))
