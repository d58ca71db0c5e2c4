"""Limb-plane representation of big field elements for the TPU kernels.

A field element is a vector of L 16-bit limbs stored in uint32 lanes
(little-endian limb order), shape (..., L):

    BLS12-377 Fr : L = 16   (253-bit)
    BLS12-377 Fq / BW6-761 Fr : L = 24   (377-bit)
    BW6-761  Fq : L = 48   (761-bit)

16-bit limbs keep every partial product exact in uint32 (max (2^16-1)^2)
and every lo/hi-split accumulation of <= 2^15 terms exact in both uint32
and float32 (sums < 2^22 < 2^24), which is what lets the schoolbook
convolution ride the MXU as an f32 matmul (see fp_jax.FpTPU).

This module is pure NumPy/host: packing, unpacking and per-modulus
Montgomery constants.  (Equivalent role to libff's bigint/Fp model —
SURVEY.md section 2b — redesigned for limb-plane SIMD.)
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def num_limbs(modulus: int) -> int:
    return -(-modulus.bit_length() // LIMB_BITS)


def to_limbs(x: int, L: int) -> np.ndarray:
    """Pack a non-negative int into L uint32 limbs (little-endian)."""
    assert 0 <= x < (1 << (LIMB_BITS * L))
    return np.array(
        [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(L)],
        dtype=np.uint32,
    )


def from_limbs(a) -> int:
    """Unpack (L,) limbs (any integer dtype, possibly unnormalized)."""
    acc = 0
    for i, v in enumerate(np.asarray(a).tolist()):
        acc += int(v) << (LIMB_BITS * i)
    return acc


def batch_to_limbs(xs, L: int) -> np.ndarray:
    """Pack a list of ints -> (N, L) uint32 (via C-level int.to_bytes;
    the per-limb Python loop dominated host packing at setup scale)."""
    nbytes = 2 * L
    assert LIMB_BITS == 16
    buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
    return (
        np.frombuffer(buf, dtype="<u2")
        .reshape(len(xs), L)
        .astype(np.uint32)
    )


def batch_from_limbs(arr) -> list:
    """(N, L) limbs -> list of ints.  Fast path via int.from_bytes when the
    limbs are normalized 16-bit values (always true for kernel outputs);
    falls back to the generic per-limb accumulation otherwise."""
    a = np.asarray(arr)
    assert a.ndim == 2
    if (
        LIMB_BITS == 16
        and a.dtype.kind in "iu"
        and a.size
        and int(a.min()) >= 0
        and int(a.max()) < (1 << LIMB_BITS)
    ):
        nbytes = 2 * a.shape[1]
        buf = a.astype("<u2").tobytes()
        return [
            int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little")
            for i in range(a.shape[0])
        ]
    return [from_limbs(row) for row in a]


@dataclasses.dataclass(frozen=True)
class MontgomeryParams:
    """Per-modulus constants for Montgomery arithmetic in base 2^16."""

    p: int
    L: int
    n0inv: int  # -p^{-1} mod 2^16
    r_mod_p: int  # R = 2^(16 L) mod p
    r2_mod_p: int  # R^2 mod p
    p_limbs: np.ndarray
    r2_limbs: np.ndarray
    one_mont_limbs: np.ndarray  # R mod p, i.e. 1 in Montgomery form


@functools.lru_cache(maxsize=None)
def mont_params(p: int) -> MontgomeryParams:
    L = num_limbs(p)
    R = 1 << (LIMB_BITS * L)
    n0inv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    r_mod_p = R % p
    r2 = R * R % p
    return MontgomeryParams(
        p=p,
        L=L,
        n0inv=n0inv,
        r_mod_p=r_mod_p,
        r2_mod_p=r2,
        p_limbs=to_limbs(p, L),
        r2_limbs=to_limbs(r2, L),
        one_mont_limbs=to_limbs(r_mod_p, L),
    )
