"""Host <-> device glue for the JAX curve kernels, and the MSM entry points
used by the Groth16 TPU prover.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..ff import fp2_jax, fp_jax
from ..ff import limb as lb
from ..ff import params as P
from . import host_curve as hc
from .curve_jax import JacCurve, jac_point


@functools.lru_cache(maxsize=None)
def g1_curve_tpu(curve_name: str) -> JacCurve:
    return JacCurve(fp_jax.field(P.CURVES[curve_name].q))


@functools.lru_cache(maxsize=None)
def g2_curve_tpu(curve_name: str) -> JacCurve:
    if curve_name == "bls12-377":
        return JacCurve(fp2_jax.bls12_377_fq2())
    if curve_name == "bw6-761":
        # BW6-761 G2 coordinates live in Fq itself
        return JacCurve(fp_jax.field(P.BW6_761_Q))
    raise KeyError(curve_name)


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def pack_g1_points(curve_name: str, pts: Sequence) -> dict:
    """Host affine points (or None) -> batched Jacobian device arrays."""
    F = fp_jax.field(P.CURVES[curve_name].q)
    xs, ys, zs = [], [], []
    for pt in pts:
        if pt is None:
            xs.append(0), ys.append(0), zs.append(0)
        else:
            xs.append(pt[0]), ys.append(pt[1]), zs.append(1)
    return jac_point(F.pack(xs), F.pack(ys), F.pack(zs))


def pack_g2_points(curve_name: str, pts: Sequence) -> dict:
    if curve_name == "bw6-761":
        return pack_g1_points("bw6-761", pts)
    F2 = fp2_jax.bls12_377_fq2()
    zero2 = (0, 0)
    one2 = (1, 0)
    xs = [zero2 if pt is None else pt[0] for pt in pts]
    ys = [zero2 if pt is None else pt[1] for pt in pts]
    zs = [zero2 if pt is None else one2 for pt in pts]
    return jac_point(F2.pack(xs), F2.pack(ys), F2.pack(zs))


def unpack_g1_point(curve_name: str, pt_dev) -> Optional[tuple]:
    """One device Jacobian point -> host affine tuple (or None)."""
    F = fp_jax.field(P.CURVES[curve_name].q)
    x, y, z = (
        F.unpack(pt_dev["x"][None, :])[0],
        F.unpack(pt_dev["y"][None, :])[0],
        F.unpack(pt_dev["z"][None, :])[0],
    )
    if z == 0:
        return None
    fq = hc.g1_curve(curve_name).F
    zinv = fq.inv(z)
    zinv2 = fq.sqr(zinv)
    return (fq.mul(x, zinv2), fq.mul(y, fq.mul(zinv2, zinv)))


def unpack_g2_point(curve_name: str, pt_dev) -> Optional[tuple]:
    if curve_name == "bw6-761":
        return unpack_g1_point("bw6-761", pt_dev)
    F2 = fp2_jax.bls12_377_fq2()
    x = F2.unpack(pt_dev["x"][None])[0]
    y = F2.unpack(pt_dev["y"][None])[0]
    z = F2.unpack(pt_dev["z"][None])[0]
    fq2 = hc.g2_curve(curve_name).F
    if fq2.is_zero(z):
        return None
    zinv = fq2.inv(z)
    zinv2 = fq2.sqr(zinv)
    return (fq2.mul(x, zinv2), fq2.mul(y, fq2.mul(zinv2, zinv)))


def _scalars_to_bytes(scalars: Sequence[int], num_bits: int) -> np.ndarray:
    nbytes = -(-num_bits // 8)
    buf = bytearray()
    for s in scalars:
        buf += int(s).to_bytes(nbytes, "big")
    return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(
        len(scalars), nbytes
    )


def scalar_bit_planes(scalars: Sequence[int], num_bits: int) -> jnp.ndarray:
    """(num_bits, N) int32, MSB first (vectorized via unpackbits)."""
    b = _scalars_to_bytes(scalars, num_bits)
    bits = np.unpackbits(b, axis=1)  # MSB-first per scalar
    bits = bits[:, bits.shape[1] - num_bits :]
    return jnp.asarray(bits.T.astype(np.int32))


# ---------------------------------------------------------------------------
# MSM entry points (host scalars/points in, host affine point out)
# ---------------------------------------------------------------------------


def msm_g1(curve_name: str, scalars: Sequence[int], points: Sequence):
    r = P.CURVES[curve_name].r
    crv = g1_curve_tpu(curve_name)
    bits = scalar_bit_planes([s % r for s in scalars], r.bit_length())
    acc = crv.msm(bits, pack_g1_points(curve_name, points))
    return unpack_g1_point(curve_name, acc)


def msm_g2(curve_name: str, scalars: Sequence[int], points: Sequence):
    r = P.CURVES[curve_name].r
    crv = g2_curve_tpu(curve_name)
    bits = scalar_bit_planes([s % r for s in scalars], r.bit_length())
    acc = crv.msm(bits, pack_g2_points(curve_name, points))
    return unpack_g2_point(curve_name, acc)


def scalar_digit_planes(
    scalars: Sequence[int], num_bits: int, c: int
) -> jnp.ndarray:
    """(num_windows, N) int32 c-bit digits, most significant window first
    (vectorized: bit planes regrouped into c-bit windows)."""
    num_windows = -(-num_bits // c)
    b = _scalars_to_bytes(scalars, num_windows * c)
    bits = np.unpackbits(b, axis=1)[:, b.shape[1] * 8 - num_windows * c :]
    w = bits.reshape(len(scalars), num_windows, c)
    weights = (1 << np.arange(c - 1, -1, -1)).astype(np.int32)
    digits = (w * weights).sum(axis=2).astype(np.int32)
    return jnp.asarray(digits.T)


MSM_WINDOW_C = 8


@functools.lru_cache(maxsize=None)
def msm_jit(curve_name: str, g2: bool, c: int = MSM_WINDOW_C):
    """Cached jitted Pippenger MSM entry: (digits, pts) -> Jacobian point.
    Field constants ride as jit arguments (axon const-folding hazard)."""
    from ..utils.jit_utils import bound_jit

    crv = g2_curve_tpu(curve_name) if g2 else g1_curve_tpu(curve_name)
    return bound_jit([crv.F], lambda d, p: crv.msm_pippenger(d, p, c))


# ---------------------------------------------------------------------------
# windowed fixed-base scalar multiplication (trusted-setup hot kernel)
# ---------------------------------------------------------------------------

#: window width for the fixed-base table.  c=5 turns the 253/377-bit
#: double-and-add scan (1 dbl + 1 unified add per bit) into ~bits/5 mixed
#: adds against a host-precomputed table — ~8x fewer field muls.
FIXED_BASE_WINDOW_C = 5


@functools.lru_cache(maxsize=None)
def _fixed_base_host_table(curve_name: str, g2: bool, base_key, c: int):
    """Host-side window table rows[j][d] = d * 2^{jc} * base (affine; d=0
    entries are None).  Row 0 is the LEAST significant window."""
    crv = hc.g2_curve(curve_name) if g2 else hc.g1_curve(curve_name)
    base = base_key
    r = P.CURVES[curve_name].r
    num_windows = -(-r.bit_length() // c)
    rows = []
    p = base
    for _ in range(num_windows):
        row = [None, p]
        for _d in range(2, 1 << c):
            row.append(crv.add(row[-1], p))
        rows.append(row)
        for _ in range(c):
            p = crv.dbl(p)
    return rows


@functools.lru_cache(maxsize=None)
def _fixed_base_device_table(curve_name: str, g2: bool, base_key, c: int):
    """(tx, ty, tinf, z_one) device arrays; t* shaped (W, 2^c, ...limbs)."""
    rows = _fixed_base_host_table(curve_name, g2, base_key, c)
    W, D = len(rows), 1 << c
    flat = [pt for row in rows for pt in row]
    if g2 and curve_name not in ("bw6-761", "mnt6-298"):
        F = fp2_jax.bls12_377_fq2()
        zero = (0, 0)
        xs = F.pack([zero if pt is None else pt[0] for pt in flat])
        ys = F.pack([zero if pt is None else pt[1] for pt in flat])
        z_one = F.pack([(1, 0)])
    else:
        q = P.CURVES[curve_name].q
        F = fp_jax.field(q)
        xs = F.pack([0 if pt is None else pt[0] for pt in flat])
        ys = F.pack([0 if pt is None else pt[1] for pt in flat])
        z_one = F.pack([1])
    tx = xs.reshape(W, D, *xs.shape[1:])
    ty = ys.reshape(W, D, *ys.shape[1:])
    tinf = jnp.asarray(
        np.array([pt is None for pt in flat], dtype=bool).reshape(W, D)
    )
    return tx, ty, tinf, z_one[0]


@functools.lru_cache(maxsize=None)
def fixed_base_jit(curve_name: str, g2: bool):
    """Cached jitted windowed fixed-base multiply:
    (digits (W, N) LSB-window-first, tx, ty, tinf, z_one) -> Jacobian pts."""
    import jax

    from ..utils.jit_utils import bound_jit

    crv = g2_curve_tpu(curve_name) if g2 else g1_curve_tpu(curve_name)

    def run(digits, tx, ty, tinf, z_one):
        n = digits.shape[1]
        xs0 = tx[0][digits[0]]

        def body(acc, xs):
            drow, txj, tyj, tinfj = xs
            q = {"x": txj[drow], "y": tyj[drow], "inf": tinfj[drow]}
            return crv.add_mixed(acc, q, z_one), None

        acc0 = jac_point(
            jnp.zeros_like(xs0), jnp.zeros_like(xs0),
            jnp.zeros((n, *z_one.shape), z_one.dtype),
        )
        acc, _ = jax.lax.scan(body, acc0, (digits, tx, ty, tinf))
        return acc

    return bound_jit([crv.F], run)


def fixed_base_mul_batch(
    curve_name: str,
    g2: bool,
    scalars: Sequence[int],
    base,
    c: int = FIXED_BASE_WINDOW_C,
):
    """[k_i] * base for all i on device (windowed; base table cached)."""
    r = P.CURVES[curve_name].r
    digits = scalar_digit_planes([s % r for s in scalars], r.bit_length(), c)
    digits = jnp.asarray(np.asarray(digits)[::-1].copy())  # LSB window first
    tx, ty, tinf, z_one = _fixed_base_device_table(curve_name, g2, base, c)
    return fixed_base_jit(curve_name, g2)(digits, tx, ty, tinf, z_one)


@functools.lru_cache(maxsize=None)
def batch_mul_jit(curve_name: str, g2: bool):
    """Cached jitted batched fixed-base scalar multiply:
    (bits (num_bits, N), base_batch pts) -> pts."""
    import jax

    from ..utils.jit_utils import bound_jit

    crv = g2_curve_tpu(curve_name) if g2 else g1_curve_tpu(curve_name)

    def run(bits, base_batch):
        def body(acc, bit_row):
            acc = crv.dbl(acc)
            added = crv.add(acc, base_batch)
            acc = crv.select(bit_row > 0, added, acc)
            return acc, None

        acc0 = {k: jnp.zeros_like(v) for k, v in base_batch.items()}
        acc, _ = jax.lax.scan(body, acc0, bits)
        return acc

    return bound_jit([crv.F], run)


def msm_g1_pippenger(curve_name: str, scalars, points, c: int = MSM_WINDOW_C):
    r = P.CURVES[curve_name].r
    digits = scalar_digit_planes([s % r for s in scalars], r.bit_length(), c)
    acc = msm_jit(curve_name, False, c)(
        digits, pack_g1_points(curve_name, points)
    )
    return unpack_g1_point(curve_name, acc)


def msm_g2_pippenger(curve_name: str, scalars, points, c: int = MSM_WINDOW_C):
    r = P.CURVES[curve_name].r
    digits = scalar_digit_planes([s % r for s in scalars], r.bit_length(), c)
    acc = msm_jit(curve_name, True, c)(
        digits, pack_g2_points(curve_name, points)
    )
    return unpack_g2_point(curve_name, acc)


def _jac_to_affine_batch(fq, xs, ys, zs) -> list:
    """Jacobian -> affine with ONE inversion for the whole batch
    (host_field.batch_inverse); naive per-point exponentiation dominated
    trusted-setup wall time."""
    from ..ff.host_field import batch_inverse

    zinvs = batch_inverse(fq, zs)
    out = []
    for x, y, z, zinv in zip(xs, ys, zs, zinvs):
        if fq.is_zero(z):
            out.append(None)
            continue
        zinv2 = fq.sqr(zinv)
        out.append((fq.mul(x, zinv2), fq.mul(y, fq.mul(zinv2, zinv))))
    return out


def unpack_g1_points_batch(curve_name: str, pts_dev) -> list:
    """Batched device->host affine conversion (ONE device transfer per
    coordinate; per-point device slicing costs a tunnel round-trip each on
    the remote-TPU backend)."""
    F = fp_jax.field(P.CURVES[curve_name].q)
    xs = F.unpack(pts_dev["x"])
    ys = F.unpack(pts_dev["y"])
    zs = F.unpack(pts_dev["z"])
    return _jac_to_affine_batch(hc.g1_curve(curve_name).F, xs, ys, zs)


def unpack_g2_points_batch(curve_name: str, pts_dev) -> list:
    if curve_name in ("bw6-761", "mnt6-298"):
        return unpack_g1_points_batch(curve_name, pts_dev)
    F2 = fp2_jax.bls12_377_fq2()
    xs = F2.unpack(pts_dev["x"])
    ys = F2.unpack(pts_dev["y"])
    zs = F2.unpack(pts_dev["z"])
    return _jac_to_affine_batch(hc.g2_curve(curve_name).F, xs, ys, zs)
