"""Transposed (limb-major) field arithmetic helpers for the Pallas kernels.

Same math as ff/fp8.py but on (L, B)-shaped arrays — the limb axis rides
the TPU SUBLANES and the batch axis fills all 128 LANES, so every VPU op
runs at full lane utilization (a (B, 48) layout wastes 62% of the lanes).
Pure functions over a transposed-constants dict ``tc`` so they can be
called both from Pallas kernel bodies and from plain jnp code.

Exactness contract (same as fp8.py): limbs are 8-bit, canonical at op
boundaries; the a*b convolution uses f32 outer products (exact <= 65025;
i32 multiplies are ~10x slower than f32 on the VPU — measured) split into
bf16-exact bytes and contracted on the MXU; constant multiplies are dense
Toeplitz bf16 matmuls; carries are byte-fold rounds + a Kogge-Stone pass.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from . import fp8

MASK = 255


def make_tconsts(F: "fp8.Fp8TPU") -> dict:
    """Transposed constant set for a modulus (host-built, jit-arg safe)."""
    L = F.L
    h = L // 2 if F.karatsuba else L
    oh_lo, oh_hi = fp8._onehot_np(h)
    p_l = np.asarray(F.p_limbs)
    nprime = (-pow(F.p, -1, 1 << (8 * L))) % (1 << (8 * L))
    np_l = fp8.to_limbs8(nprime, L)
    return {
        "L": L,
        "h": h,
        "karatsuba": F.karatsuba,
        "p": jnp.asarray(p_l.reshape(L, 1)),
        "comp_p": jnp.asarray((MASK - p_l).reshape(L, 1)),
        "one_mont": jnp.asarray(
            np.asarray(F.one_mont).reshape(L, 1)
        ),
        "oh_lo_t": jnp.asarray(oh_lo.T, dtype=jnp.bfloat16),
        "oh_hi_t": jnp.asarray(oh_hi.T, dtype=jnp.bfloat16),
        "toep_np_t": jnp.asarray(
            fp8._toeplitz_np(np_l, L).T, dtype=jnp.bfloat16
        ),
        "toep_p_t": jnp.asarray(
            fp8._toeplitz_np(p_l, 2 * L).T, dtype=jnp.bfloat16
        ),
    }


# ``tc`` static fields (L, h, karatsuba) ride along; array fields are
# jit arguments.  Split helpers:
TC_ARRAYS = (
    "p",
    "comp_p",
    "one_mont",
    "oh_lo_t",
    "oh_hi_t",
    "toep_np_t",
    "toep_p_t",
)


def _shift_down(x, d):
    """Shift limbs towards higher indices by d along axis 0 (value * R^d)."""
    return jnp.concatenate(
        [jnp.zeros((d, *x.shape[1:]), x.dtype), x[: x.shape[0] - d]], axis=0
    )


def fold_round_t(acc):
    lo = acc & MASK
    hi = acc >> 8
    z = jnp.zeros((1, *acc.shape[1:]), acc.dtype)
    return jnp.concatenate([lo, z], axis=0) + jnp.concatenate(
        [z, hi], axis=0
    )


def kogge_stone_t(acc):
    """Exact carry resolution; limbs <= 510 (511 allowed at limb 0)."""
    g = acc >> 8
    r = acc & MASK
    p = (r == MASK).astype(acc.dtype)
    K = acc.shape[0]
    d = 1
    G, Pp = g, p
    while d < K:
        G = G | (Pp & _shift_down(G, d))
        Pp = Pp & _shift_down(Pp, d)
        d <<= 1
    cin = _shift_down(G, 1)
    return (r + cin) & MASK, G[K - 1]


def carry_exact_t(acc, folds: int):
    for _ in range(folds):
        acc = fold_round_t(acc)
    return kogge_stone_t(acc)


def _inc_limb0(t):
    """t with limb 0 incremented (concat form: Mosaic has no scatter)."""
    return jnp.concatenate([t[0:1] + 1, t[1:]], axis=0)


# ---------------------------------------------------------------------------
# 16-bit carry domain (round 4)
#
# Carry resolution cost scales with rows x steps; running it on combined
# 16-bit limbs (adjacent byte pairs) halves the rows AND drops one
# Kogge-Stone step — ~1.9x on the dominant VPU cost of every field op.
# Bytes remain the *storage* and conv-operand form (bf16-exact one-hot
# contraction needs byte operands); only the carry networks ride 16-bit.
# ---------------------------------------------------------------------------

MASK16 = 0xFFFF


def combine16(acc):
    """(K, ...) 8-bit-weighted i32 rows -> (K/2, ...) 16-bit-weighted.
    Precondition: K even and acc[2i] + 256*acc[2i+1] < 2^31 (true for
    limbs <= ~8.3M — every conv accumulator this framework produces).
    Reshape+index form: strided sublane slices don't lower in Mosaic."""
    pairs = acc.reshape(acc.shape[0] // 2, 2, *acc.shape[1:])
    return pairs[:, 0] + (pairs[:, 1] << 8)


def split16(c16):
    """(K2, ...) canonical 16-bit rows -> (2*K2, ...) canonical bytes."""
    lo = c16 & MASK
    hi = c16 >> 8
    return jnp.stack([lo, hi], axis=1).reshape(-1, *c16.shape[1:])


def fold16_round(acc):
    lo = acc & MASK16
    hi = acc >> 16
    z = jnp.zeros((1, *acc.shape[1:]), acc.dtype)
    return jnp.concatenate([lo, z], axis=0) + jnp.concatenate(
        [z, hi], axis=0
    )


def kogge_stone16(acc):
    """Exact carry for 16-bit rows <= 2*65535 (131070); returns
    (canonical 16-bit rows, carry_out)."""
    g = acc >> 16
    r = acc & MASK16
    p = (r == MASK16).astype(acc.dtype)
    K = acc.shape[0]
    d = 1
    G, Pp = g, p
    while d < K:
        G = G | (Pp & _shift_down(G, d))
        Pp = Pp & _shift_down(Pp, d)
        d <<= 1
    cin = _shift_down(G, 1)
    return (r + cin) & MASK16, G[K - 1]


def carry16_exact_t(acc, folds: int):
    """carry_exact_t equivalent through the 16-bit domain.  ``folds``:
    0 when input limbs <= 510 (one KS16 pass suffices), else 1 (handles
    any i32 conv accumulator).  Returns (byte rows, carry_out); output
    gains 2 byte rows per fold."""
    if acc.shape[0] % 2:
        acc = jnp.concatenate(
            [acc, jnp.zeros((1, *acc.shape[1:]), acc.dtype)], axis=0
        )
    c = combine16(acc)
    for _ in range(folds):
        c = fold16_round(c)
    out16, carry = kogge_stone16(c)
    return split16(out16), carry


def cond_sub_p_t(x, tc):
    t = _inc_limb0(x + tc["comp_p"])
    sub, no_borrow = kogge_stone_t(t)
    return jnp.where((no_borrow > 0)[None], sub, x)


def add_t(a, b, tc):
    s, _ = kogge_stone_t(a + b)
    return cond_sub_p_t(s, tc)


def sub_t(a, b, tc):
    t = _inc_limb0(a + (MASK - b) + tc["p"])
    s, _ = carry_exact_t(t, 1)
    return cond_sub_p_t(s[: tc["L"]], tc)


def neg_t(a, tc):
    return sub_t(jnp.zeros_like(a), a, tc)


def double_t(a, tc):
    return add_t(a, a, tc)


def _conv_onehot_t(a, b, tc):
    """Signed-byte-valued (h, B) vectors -> (2h, B) i32 convolution.

    Round-5 formulation: nibble-split ONE OPERAND instead of the product.
    a = 16*(a>>4) + (a&15) exactly (arithmetic shift handles the signed
    karatsuba differences), so conv(a,b) = conv(a&15, b) + 16*conv(a>>4,
    b).  Each partial product is f32-exact (|.| <= 16*255 = 4080, 12
    bits) and each one-hot contraction sum is <= h^2 * 4080 <= 9.4M <
    2^24 for h <= 48 — exact in f32 accumulation (HIGHEST precision =
    bf16x3 passes on the MXU, exact for <= 24 significand bits).  The
    partials recombine in i32.

    MEASURED SLOWER on chip (round-5 ablation: reduce 2514 ms vs ~1300 ms
    at BLS n=2^18): HIGHEST-precision f32 matmuls lower to 6-9 bf16
    passes per contraction, and the MXU — idle in the byte-split form —
    becomes the bottleneck.  The byte product-split form (one bf16 pass
    per one-hot matrix) stays the default; ZECALE_CONV_NIBBLE=1 selects
    this variant for re-measurement on other hardware."""
    import os as _os

    h = a.shape[0]
    if not _os.environ.get("ZECALE_CONV_NIBBLE"):
        af = a.astype(jnp.float32)
        bf = b.astype(jnp.float32)
        prod = af[:, None] * bf[None, :]  # (h, h, B) f32, exact
        hi = jnp.floor(prod * (1.0 / 256.0))
        lo = prod - hi * 256.0
        lo = lo.astype(jnp.bfloat16).reshape(h * h, -1)
        hi = hi.astype(jnp.bfloat16).reshape(h * h, -1)
        acc = jnp.matmul(
            tc["oh_lo_t"], lo, preferred_element_type=jnp.float32
        ) + jnp.matmul(tc["oh_hi_t"], hi, preferred_element_type=jnp.float32)
        return acc.astype(jnp.int32).reshape(2 * h, *a.shape[1:])
    assert h <= 48, "nibble-split conv exactness bound (h^2*4080 < 2^24)"
    import jax as _jax

    a_lo = (a & 15).astype(jnp.float32)   # [0, 15]
    a_hi = (a >> 4).astype(jnp.float32)   # [-16, 15] arithmetic
    bf = b.astype(jnp.float32)
    lo = (a_lo[:, None] * bf[None, :]).reshape(h * h, -1)
    hi = (a_hi[:, None] * bf[None, :]).reshape(h * h, -1)
    oh = tc["oh_lo_t"].astype(jnp.float32)
    acc_lo = jnp.matmul(
        oh, lo, preferred_element_type=jnp.float32,
        precision=_jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)
    acc_hi = jnp.matmul(
        oh, hi, preferred_element_type=jnp.float32,
        precision=_jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)
    return (acc_lo + (acc_hi << 4)).reshape(2 * h, *a.shape[1:])


def conv_ab_t(a, b, tc):
    L = tc["L"]
    if not tc["karatsuba"]:
        return _conv_onehot_t(a, b, tc)
    h = L // 2
    a0, a1 = a[:h], a[h:]
    b0, b1 = b[:h], b[h:]
    z0 = _conv_onehot_t(a0, b0, tc)
    z2 = _conv_onehot_t(a1, b1, tc)
    zm = _conv_onehot_t(a0 - a1, b0 - b1, tc)
    z1 = z0 + z2 - zm
    zrow = jnp.zeros((h, *a.shape[1:]), jnp.int32)
    t_lo = jnp.concatenate([z0, zrow, zrow], axis=0)
    t_mid = jnp.concatenate([zrow, z1, zrow], axis=0)
    t_hi = jnp.concatenate([zrow, zrow, z2], axis=0)
    return t_lo + t_mid + t_hi


def mont_mul_t(a, b, tc):
    L = tc["L"]
    T = conv_ab_t(a, b, tc)  # (2L, B) i32
    Tc, _ = carry_exact_t(T, 2)
    Tc = Tc[: 2 * L]
    t_lo = Tc[:L]
    m_acc = jnp.matmul(
        tc["toep_np_t"],
        t_lo.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    m, _ = carry_exact_t(m_acc, 2)
    m = m[:L]
    mp = jnp.matmul(
        tc["toep_p_t"],
        m.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    Sc, _ = carry_exact_t(Tc + mp, 2)
    return cond_sub_p_t(Sc[L : 2 * L], tc)


def mont_sqr_t(a, tc):
    return mont_mul_t(a, a, tc)


def is_zero_t(a):
    return jnp.all(a == 0, axis=0)


def select_t(cond, t, f):
    """cond: (B,) bool; t/f: (L, B)."""
    return jnp.where(cond[None], t, f)
