"""Distributed radix-2 FFT with explicit cross-shard butterfly exchanges.

Replaces the round-1 "sharding constraint + hope GSPMD partitions the
gather network" fft_sharded (VERDICT.md weak #5) with the real thing
(SURVEY.md section 2c "FFT sequence-style parallelism"):

  * the element axis is sharded across the mesh; butterfly stages whose
    span is INSIDE a shard run as plain local reshape-butterflies;
  * the log2(D) stages whose span crosses shards exchange the partner
    shard with ONE jax.lax.ppermute (XOR-partner pattern) each and combine
    locally — the classic hypercube FFT, riding ICI;
  * NO runtime bit-reversal anywhere: the inverse transform is computed
    decimation-in-frequency (natural input -> bit-reversed output) and the
    forward transform decimation-in-time (bit-reversed input -> natural
    output), so the QAP pipeline's intermediate products simply live in
    bit-reversed order and all index-dependent constants (coset scales,
    the H-query point order) are bit-reverse-permuted STATICALLY on host.

Layout (reference capability: libfqfft's basic_radix2_domain — SURVEY.md
section 2b — scaled past one chip).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from ..ff import fp_jax
from ..ff import limb as lb
from ..poly import domain_host

AXIS = "points"


def bitrev_permutation(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    rev = np.zeros(n, dtype=np.int32)
    for i in range(n):
        rev[i] = int(bin(i)[2:].zfill(bits)[::-1], 2)
    return rev


@functools.lru_cache(maxsize=None)
def _plan_np(n: int, D: int, r: int, inverse: bool):
    """Host plan for an n-point transform over D shards.

    Returns (local_tw, cross_tw, sinv):
      local_tw[s]: (S/2, L) twiddle tile for local stage half=2^s
                   (device-uniform — the tile pattern repeats per shard);
      cross_tw[k]: (n, L) full-length per-position twiddle table for the
                   cross stage with half = S * 2^k (sharded operand);
                   positions in the u-half hold Montgomery 1 (DIF) or the
                   shared w_j (DIT; identical at i and i+half).
      sinv: (L,) Montgomery 1/n.
    """
    assert n % D == 0
    S = n // D
    d = domain_host.domain(n, r)
    omega = d.omega_inv if inverse else d.omega
    mp = lb.mont_params(r)
    bits = n.bit_length() - 1
    local_bits = S.bit_length() - 1

    local_tw = []
    for s in range(local_bits):
        half = 1 << s
        w = pow(omega, n // (2 * half), r)
        tws, cur = [], 1
        for _ in range(half):
            tws.append(cur * mp.r_mod_p % r)
            cur = cur * w % r
        reps = (S // 2) // half
        local_tw.append(
            np.tile(lb.batch_to_limbs(tws, mp.L).astype(np.int32), (reps, 1))
        )

    cross_tw = []
    one_m = mp.r_mod_p % r
    for s in range(local_bits, bits):
        half = 1 << s
        w = pow(omega, n // (2 * half), r)
        vals = []
        for i in range(n):
            j = i % half
            if (i % (2 * half)) < half:
                # u position: DIF uses 1 here; DIT shares w^j (same j)
                vals.append(pow(w, j, r) * mp.r_mod_p % r)
            else:
                vals.append(pow(w, j, r) * mp.r_mod_p % r)
        cross_tw.append(lb.batch_to_limbs(vals, mp.L).astype(np.int32))

    sinv = lb.to_limbs(
        pow(n, r - 2, r) * mp.r_mod_p % r, mp.L
    ).astype(np.int32)
    return local_tw, cross_tw, sinv


def plan_arrays(n: int, D: int, r: int, inverse: bool):
    lt, ct, sinv = _plan_np(n, D, r, inverse)
    return (
        [jnp.asarray(t) for t in lt],
        [jnp.asarray(t) for t in ct],
        jnp.asarray(sinv),
    )


# ---------------------------------------------------------------------------
# per-shard stage bodies (run INSIDE shard_map; x_l is the local shard)
# ---------------------------------------------------------------------------


def _local_butterfly_dit(F, x_l, tw, half):
    S = x_l.shape[0]
    blocks = x_l.reshape(S // (2 * half), 2 * half, F.L)
    u = blocks[:, :half, :].reshape(S // 2, F.L)
    v = blocks[:, half:, :].reshape(S // 2, F.L)
    tv = F.mont_mul(v, tw)
    lo = F.add(u, tv)
    hi = F.sub(u, tv)
    return jnp.concatenate(
        [
            lo.reshape(-1, half, F.L),
            hi.reshape(-1, half, F.L),
        ],
        axis=1,
    ).reshape(S, F.L)


def _local_butterfly_dif(F, x_l, tw, half):
    S = x_l.shape[0]
    blocks = x_l.reshape(S // (2 * half), 2 * half, F.L)
    u = blocks[:, :half, :].reshape(S // 2, F.L)
    v = blocks[:, half:, :].reshape(S // 2, F.L)
    lo = F.add(u, v)
    hi = F.mont_mul(F.sub(u, v), tw)
    return jnp.concatenate(
        [
            lo.reshape(-1, half, F.L),
            hi.reshape(-1, half, F.L),
        ],
        axis=1,
    ).reshape(S, F.L)


def _cross_stage(F, x_l, tw_l, dist: int, D: int, dit: bool):
    """One cross-shard butterfly stage: XOR-partner exchange via ppermute.

    ``dist``: partner distance in shard units (half // S).  Whole shards
    are u-side or v-side (the stage span is a multiple of the shard size).
    """
    me = jax.lax.axis_index(AXIS)
    perm = [(d, d ^ dist) for d in range(D)]
    p = jax.lax.ppermute(x_l, AXIS, perm)
    is_u = (me & dist) == 0
    if dit:
        u_val = jnp.where(is_u, x_l, p)
        v_val = jnp.where(is_u, p, x_l)
        t = F.mont_mul(v_val, tw_l)
        return jnp.where(is_u, F.add(u_val, t), F.sub(u_val, t))
    # DIF: u' = u + v ; v' = (u - v) * w
    u_val = jnp.where(is_u, x_l, p)
    v_val = jnp.where(is_u, p, x_l)
    summ = F.add(u_val, v_val)
    diff = F.mont_mul(F.sub(u_val, v_val), tw_l)
    return jnp.where(is_u, summ, diff)


def ifft_dif_local(F, x_l, local_tw, cross_tw, sinv, D: int):
    """Inverse FFT, natural input -> BIT-REVERSED output (per-shard body).
    Stages run from the largest span (cross-shard) down to 1."""
    n_cross = len(cross_tw)
    for k in range(n_cross - 1, -1, -1):
        x_l = _cross_stage(F, x_l, cross_tw[k], 1 << k, D, dit=False)
    for s in range(len(local_tw) - 1, -1, -1):
        x_l = _local_butterfly_dif(F, x_l, local_tw[s], 1 << s)
    return F.mont_mul(x_l, jnp.broadcast_to(sinv, x_l.shape))


def fft_dit_local(F, x_l, local_tw, cross_tw, D: int):
    """Forward FFT, BIT-REVERSED input -> natural output (per-shard body)."""
    for s in range(len(local_tw)):
        x_l = _local_butterfly_dit(F, x_l, local_tw[s], 1 << s)
    for k in range(len(cross_tw)):
        x_l = _cross_stage(F, x_l, cross_tw[k], 1 << k, D, dit=True)
    return x_l


# ---------------------------------------------------------------------------
# public sharded entry points
# ---------------------------------------------------------------------------


def _sharded_call(mesh: Mesh, fn, n_plans: int):
    """shard_map wrapper: first arg sharded values, then n_plans plan
    pytrees (local tiles replicated, cross tables sharded, sinv repl.)."""
    D = mesh.devices.size

    def spec_for_plan(plan):
        lt, ct, sinv = plan
        return (
            [PS(*([None] * t.ndim)) for t in lt],
            [PS(AXIS, None) for _ in ct],
            PS(None),
        )

    def wrap(values, *plans):
        specs = tuple(spec_for_plan(p) for p in plans)
        return shard_map(
            fn,
            mesh=mesh,
            in_specs=(PS(AXIS, None), *specs),
            out_specs=PS(AXIS, None),
            check_rep=False,
        )(values, *plans)

    return wrap


@functools.lru_cache(maxsize=None)
def _jitted_transform(mesh: Mesh, n: int, r: int, inverse: bool):
    """Cached jax.jit of the sharded transform.  The jit wrapper matters
    enormously: a bare shard_map call runs EAGERLY (one mini-compile per
    primitive through the shard-map machinery — measured 47 s for one
    n=16 transform on the 8-device CPU mesh vs 3.6 s traced+compiled)."""
    F = fp_jax.field(r)
    D = mesh.devices.size

    if inverse:

        def body(x_l, plan_l):
            lt, ct, sinv = plan_l
            return ifft_dif_local(F, x_l, lt, ct, sinv, D)

    else:

        def body(x_l, plan_l):
            lt, ct, _ = plan_l
            return fft_dit_local(F, x_l, lt, ct, D)

    return jax.jit(_sharded_call(mesh, body, 1))


def ifft_sharded(mesh: Mesh, values, r: int):
    """values (n, L) natural order, sharded -> coefficients in BIT-REVERSED
    order (sharded).  Multiply-compatible with fft_sharded below."""
    n = values.shape[0]
    plan = plan_arrays(n, mesh.devices.size, r, inverse=True)
    return _jitted_transform(mesh, n, r, True)(values, plan)


def fft_sharded(mesh: Mesh, coeffs_bitrev, r: int):
    """coefficients in BIT-REVERSED order (sharded) -> evaluations in
    natural order (sharded)."""
    n = coeffs_bitrev.shape[0]
    plan = plan_arrays(n, mesh.devices.size, r, inverse=False)
    return _jitted_transform(mesh, n, r, False)(coeffs_bitrev, plan)


@functools.lru_cache(maxsize=None)
def _coset_scales_rev(n: int, r: int):
    """(fwd, inv) coset scale tables in BIT-REVERSED order (Montgomery)."""
    d = domain_host.domain(n, r)
    mp = lb.mont_params(r)
    rev = bitrev_permutation(n)
    g = d.coset_shift
    ginv = pow(g, r - 2, r)
    fwd, inv = [], []
    cur_f, cur_i = 1, 1
    for _ in range(n):
        fwd.append(cur_f * mp.r_mod_p % r)
        inv.append(cur_i * mp.r_mod_p % r)
        cur_f = cur_f * g % r
        cur_i = cur_i * ginv % r
    fwd = lb.batch_to_limbs(fwd, mp.L).astype(np.int32)[rev]
    inv = lb.batch_to_limbs(inv, mp.L).astype(np.int32)[rev]
    return fwd, inv


@functools.lru_cache(maxsize=None)
def _jitted_h_pipeline(mesh: Mesh, n: int, r: int):
    F = fp_jax.field(r)
    D = mesh.devices.size

    def body(abc, ip, fp, fs, is_, zi):
        # a/b/c ride ONE vmapped coset-eval body: a single compiled FFT
        # expansion (batched 3-wide) instead of three inlined copies —
        # ~2.5x smaller graph AND wider (better-utilized) kernels.
        def coset_eval(x):
            xc = ifft_dif_local(F, x, ip[0], ip[1], ip[2], D)  # bitrev
            return fft_dit_local(
                F, F.mont_mul(xc, fs), fp[0], fp[1], D
            )  # natural coset evals

        evals = jax.vmap(coset_eval)(abc)
        a_e, b_e, c_e = evals[0], evals[1], evals[2]
        h_e = F.mont_mul(
            F.sub(F.mont_mul(a_e, b_e), c_e),
            jnp.broadcast_to(zi, a_e.shape),
        )
        h_c = ifft_dif_local(F, h_e, ip[0], ip[1], ip[2], D)  # bitrev
        return F.mont_mul(h_c, is_)

    def spec_for_plan(plan):
        lt, ct, sinv = plan
        return (
            [PS(*([None] * t.ndim)) for t in lt],
            [PS(AXIS, None) for _ in ct],
            PS(None),
        )

    iplan = plan_arrays(n, D, r, inverse=True)
    fplan = plan_arrays(n, D, r, inverse=False)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            PS(None, AXIS, None),
            spec_for_plan(iplan),
            spec_for_plan(fplan),
            PS(AXIS, None),
            PS(AXIS, None),
            PS(None),
        ),
        out_specs=PS(AXIS, None),
        check_rep=False,
    )
    return jax.jit(fn)


def h_pipeline_sharded(mesh: Mesh, r: int, az, bz, cz, zinv_mont):
    """Distributed QAP division: (az, bz, cz evaluations, natural order,
    sharded) -> H coefficients in BIT-REVERSED order (sharded).

    The caller consumes H against a bit-reverse-permuted H query (static
    reorder of fixed proving-key points — no runtime permutation).
    """
    n = az.shape[0]
    D = mesh.devices.size
    iplan = plan_arrays(n, D, r, inverse=True)
    fplan = plan_arrays(n, D, r, inverse=False)
    fsc_np, isc_np = _coset_scales_rev(n, r)
    fsc, isc = jnp.asarray(fsc_np), jnp.asarray(isc_np)
    abc = jnp.stack([az, bz, cz])
    return _jitted_h_pipeline(mesh, n, r)(
        abc, iplan, fplan, fsc, isc, zinv_mont
    )
