"""Fast batched Montgomery field arithmetic on 8-bit limb planes — the
round-2 TPU compute core.

Replaces libff's GMP-backed Fp (SURVEY.md section 2b) for the hot kernels
(MSM, FFT, pairing).  Same public-op surface as fp_jax.FpTPU (add/sub/neg/
double/mont_mul/mont_sqr/inv/select/is_zero/eq/pack/unpack + the
consts()/bound() jit-argument protocol), but a different hardware mapping:

  * Elements are (..., L) int32 arrays of L **8-bit** limbs, little-endian,
    canonically reduced (< p, every limb < 256) at public-op boundaries.

  * Why 8-bit: integers up to 256 are exact in bfloat16, and f32
    accumulation of <= 2^24 worth of products is exact, so the big-int
    convolutions ride the MXU as *bf16 matmuls at full rate* instead of the
    6-pass f32-HIGHEST matmuls the 16-bit design needed.

  * a (*) b (both operands variable) uses subtractive Karatsuba over an
    outer-product/one-hot contraction: the (lo, hi) split bytes of the
    8x8-bit partial products (all in [-255, 255], bf16-exact) are contracted
    against constant 0/1 "anti-diagonal" matrices.  One Karatsuba level cuts
    the MXU FLOPs ~2.7x versus the plain one-hot contraction.

  * The two REDC constant multiplies (t*N' mod R and m*p) have a FIXED
    operand, so they are *dense banded Toeplitz matmuls* — full MXU
    efficiency, no one-hot waste.

  * Carry propagation is scan-free: a couple of data-parallel
    byte-fold rounds bring limbs below 512, then an exact Kogge-Stone
    (generate/propagate) pass resolves the remaining 0/1 carries in
    log2(L) vector steps.  (The round-1 lax.scan ripple carries dominated
    the MSM wall clock; this removes every sequential limb loop.)

  * All intermediate limb values are kept NON-NEGATIVE: subtraction is
    done via per-limb complements (a - b + p == a + (255-b) + p + 1 - R,
    where the R drop is just discarding the Kogge-Stone carry-out), so the
    carry network never needs signed borrows.

Differentially tested against ff/host_field.py (tests/test_fp8.py).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 8
MASK = 255


def num_limbs8(modulus: int) -> int:
    return -(-modulus.bit_length() // LIMB_BITS)


def to_limbs8(x: int, L: int) -> np.ndarray:
    assert 0 <= x < (1 << (LIMB_BITS * L))
    return np.frombuffer(
        int(x).to_bytes(L, "little"), dtype=np.uint8
    ).astype(np.int32)


def batch_to_limbs8(xs, L: int) -> np.ndarray:
    buf = b"".join(int(x).to_bytes(L, "little") for x in xs)
    return (
        np.frombuffer(buf, dtype=np.uint8).reshape(len(xs), L).astype(np.int32)
    )


def batch_from_limbs8(arr) -> list:
    a = np.asarray(arr)
    assert a.ndim == 2
    L = a.shape[1]
    buf = a.astype(np.uint8).tobytes()
    return [
        int.from_bytes(buf[i * L : (i + 1) * L], "little")
        for i in range(a.shape[0])
    ]


# ---------------------------------------------------------------------------
# carry machinery (scan-free)
# ---------------------------------------------------------------------------


def _fold_round(acc):
    """One byte-fold: value-preserving, shrinks limb magnitude ~256x.
    acc non-negative i32, (..., K).  Result limb k = (acc_k & 255) +
    (acc_{k-1} >> 8); the final carry-out is APPENDED (K+1 limbs)."""
    lo = acc & MASK
    hi = acc >> LIMB_BITS
    pad0 = jnp.zeros((*acc.shape[:-1], 1), acc.dtype)
    return jnp.concatenate([lo, pad0], axis=-1) + jnp.concatenate(
        [pad0, hi], axis=-1
    )


def _kogge_stone(acc):
    """Exact carry resolution for non-negative limbs <= 510 (limb 0 alone
    may be 511: it never receives an incoming carry, so its outgoing carry
    is still <= 1).

    Returns (limbs < 256 of the same length, carry_out (...,) in {0,1}).
    """
    g = acc >> LIMB_BITS  # in {0, 1}
    r = acc & MASK
    p = (r == MASK).astype(acc.dtype)
    K = acc.shape[-1]
    d = 1
    # G_k becomes "a carry comes OUT of position k"
    G, Pp = g, p
    while d < K:
        Gs = jnp.pad(G, [(0, 0)] * (G.ndim - 1) + [(d, 0)])[..., :K]
        Ps = jnp.pad(Pp, [(0, 0)] * (G.ndim - 1) + [(d, 0)])[..., :K]
        G = G | (Pp & Gs)
        Pp = Pp & Ps
        d <<= 1
    cin = jnp.pad(G, [(0, 0)] * (G.ndim - 1) + [(1, 0)])[..., :K]
    out = (r + cin) & MASK
    return out, G[..., K - 1]


def carry_exact(acc, folds: int):
    """Fully carry a non-negative i32 accumulator into canonical 8-bit limbs.

    ``folds``: number of byte-fold rounds needed to bring limbs <= 511,
    statically chosen from the input magnitude bound:
      bound < 2^9  -> 0, < 2^17 -> 1, < 2^25 -> 2, < 2^31 -> 3.
    Output gains one limb per fold round; returns (limbs, carry_out).
    """
    for _ in range(folds):
        acc = _fold_round(acc)
    return _kogge_stone(acc)


# ---------------------------------------------------------------------------
# constant matrices
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _onehot_np(L: int):
    """0/1 bf16 matrices contracting flattened outer products into a
    convolution: OH_lo[(i*L+j), k] = [i+j == k], OH_hi -> [i+j+1 == k]."""
    K = 2 * L
    lo = np.zeros((L * L, K), dtype=np.float32)
    hi = np.zeros((L * L, K), dtype=np.float32)
    for i in range(L):
        for j in range(L):
            lo[i * L + j, i + j] = 1.0
            hi[i * L + j, i + j + 1] = 1.0
    return lo, hi


def _toeplitz_np(v: np.ndarray, out_len: int) -> np.ndarray:
    """Banded matrix M[i, k] = v[k - i] so that (x @ M)[k] = (x (*) v)[k]
    truncated to out_len outputs.  v entries < 256 (bf16-exact)."""
    Lx = len(v)
    M = np.zeros((Lx, out_len), dtype=np.float32)
    for i in range(Lx):
        for j in range(len(v)):
            if i + j < out_len:
                M[i, i + j] = float(v[j])
    return M


# ---------------------------------------------------------------------------


def _bf16(x):
    return x.astype(jnp.bfloat16)


def _conv_onehot(a, b, L: int, oh_lo, oh_hi):
    """Exact convolution of signed 8-bit-valued limb vectors (entries in
    [-255, 255]) -> (..., 2L) i32.  Rides the MXU as two bf16 matmuls."""
    prod = a[..., :, None] * b[..., None, :]  # |.| <= 65025, exact i32
    lo = prod & MASK  # [0, 255]
    hi = prod >> LIMB_BITS  # [-255, 254] (arithmetic shift; exact split)
    lo = _bf16(lo).reshape(*prod.shape[:-2], L * L)
    hi = _bf16(hi).reshape(*prod.shape[:-2], L * L)
    acc = jnp.matmul(
        lo, oh_lo, preferred_element_type=jnp.float32
    ) + jnp.matmul(hi, oh_hi, preferred_element_type=jnp.float32)
    return acc.astype(jnp.int32)


class Fp8TPU:
    """Montgomery Fp over a fixed modulus on 8-bit limb planes."""

    #: one-hot conv sums must stay < 2^24 in f32: L*65025 < 2^24 needs
    #: L <= 257 — all supported moduli are fine.
    def __init__(self, p: int, karatsuba: bool | None = None):
        self.p = p
        L = num_limbs8(p)
        # round L up so Karatsuba halves are equal; also keeps matmul
        # shapes friendlier (48, 96, ...)
        if L % 2:
            L += 1
        self.L = L
        R = 1 << (LIMB_BITS * L)
        assert 2 * p < R, "need one bit of headroom for lazy conditional sub"
        nprime = (-pow(p, -1, R)) % R
        self.karatsuba = karatsuba if karatsuba is not None else (L >= 24)

        p_l = to_limbs8(p, L)
        np_l = to_limbs8(nprime, L)
        self.p_limbs = jnp.asarray(p_l)
        self.comp_p = jnp.asarray(MASK - p_l)
        self.r2_limbs = jnp.asarray(to_limbs8(R * R % p, L))
        self.one_mont = jnp.asarray(to_limbs8(R % p, L))

        half = L // 2
        oh_lo, oh_hi = _onehot_np(half if self.karatsuba else L)
        self.oh_lo = jnp.asarray(oh_lo, dtype=jnp.bfloat16)
        self.oh_hi = jnp.asarray(oh_hi, dtype=jnp.bfloat16)
        # Toeplitz REDC constants: t_lo (L) @ toep_np (L, L)   = t*N' mod R
        #                           m   (L) @ toep_p  (L, 2L)  = m*p
        self.toep_np = jnp.asarray(
            _toeplitz_np(np_l, L), dtype=jnp.bfloat16
        )
        self.toep_p = jnp.asarray(
            _toeplitz_np(p_l, 2 * L), dtype=jnp.bfloat16
        )

    # -- consts-as-arguments protocol (axon const-folding hazard) ----------
    _CONST_ATTRS = (
        "p_limbs",
        "comp_p",
        "r2_limbs",
        "one_mont",
        "oh_lo",
        "oh_hi",
        "toep_np",
        "toep_p",
    )

    @property
    def tc(self) -> dict:
        """Transposed-constants dict for the Pallas/limb-major helpers
        (ff/fp8t.py); lazily built, array fields ride consts()/bound()."""
        if not hasattr(self, "_tc"):
            from . import fp8t

            self._tc = fp8t.make_tconsts(self)
        return self._tc

    @staticmethod
    def _tc_array_keys(tc):
        """Array-valued tc entries (static ints/bools stay baked)."""
        return [k for k, v in tc.items() if not isinstance(v, (int, bool))]

    def consts(self):
        out = {a: getattr(self, a) for a in self._CONST_ATTRS}
        out["tc"] = {k: self.tc[k] for k in self._tc_array_keys(self.tc)}
        return out

    @contextlib.contextmanager
    def bound(self, c):
        old = {a: getattr(self, a) for a in self._CONST_ATTRS}
        old_tc = {k: self.tc[k] for k in self._tc_array_keys(self.tc)}
        for a in self._CONST_ATTRS:
            setattr(self, a, c[a])
        if "tc" in c:
            self._tc.update(c["tc"])
        try:
            yield
        finally:
            for a in self._CONST_ATTRS:
                setattr(self, a, old[a])
            self._tc.update(old_tc)

    # ------------------------------------------------------------------
    def zero(self, shape=()):
        return jnp.zeros((*shape, self.L), dtype=jnp.int32)

    def one_mont_elem(self):
        return self.one_mont

    # ------------------------------------------------------------------
    def _cond_sub_p(self, x):
        """x < 2p canonical-limbed -> x mod p.  Computes x - p via per-limb
        complement (all limbs stay non-negative); selects on the borrow."""
        t = x + self.comp_p
        t = t.at[..., 0].add(1)
        sub, borrow_absent = carry_exact(t, 0)  # limbs <= 511
        # borrow_absent == 1  <=>  x >= p  (x - p + R >= R)
        return jnp.where((borrow_absent > 0)[..., None], sub, x)

    def add(self, a, b):
        s, top = carry_exact(a + b, 0)
        # a + b < 2p < R so top == 0 always
        return self._cond_sub_p(s)

    def sub(self, a, b):
        # a - b + p  ==  (a + (255-b) + p + 1) - R;  result in [0, 2p) < R,
        # so dropping limb L (the R) is exact.
        t = a + (MASK - b) + self.p_limbs
        t = t.at[..., 0].add(1)
        s, _ = carry_exact(t, 1)  # limbs <= 766 -> one fold round
        return self._cond_sub_p(s[..., : self.L])

    def neg(self, a):
        return self.sub(self.zero(a.shape[:-1]), a)

    def double(self, a):
        return self.add(a, a)

    # ------------------------------------------------------------------
    def _conv_ab(self, a, b):
        """Full product convolution -> (..., 2L) i32 accumulators."""
        L = self.L
        if not self.karatsuba:
            return _conv_onehot(a, b, L, self.oh_lo, self.oh_hi)
        h = L // 2
        a0, a1 = a[..., :h], a[..., h:]
        b0, b1 = b[..., :h], b[..., h:]
        z0 = _conv_onehot(a0, b0, h, self.oh_lo, self.oh_hi)  # (.., L)
        z2 = _conv_onehot(a1, b1, h, self.oh_lo, self.oh_hi)
        # subtractive Karatsuba keeps operands in [-255, 255] (bf16-exact):
        # z1 = z0 + z2 - (a0 - a1)(b0 - b1)
        zm = _conv_onehot(a0 - a1, b0 - b1, h, self.oh_lo, self.oh_hi)
        z1 = z0 + z2 - zm
        pad = [(0, 0)] * (a.ndim - 1)
        return (
            jnp.pad(z0, pad + [(0, L)])
            + jnp.pad(z1, pad + [(h, h)])
            + jnp.pad(z2, pad + [(L, 0)])
        )

    def mont_mul(self, a, b):
        L = self.L
        T = self._conv_ab(a, b)  # (..., 2L) i32, limbs < L*2^16 + slack
        # exact canonical form of T (value < p^2 < R^2/4 -> fits 2L limbs)
        Tc, _ = carry_exact(T, 2)
        Tc = Tc[..., : 2 * L]
        t_lo = Tc[..., :L]
        # m = (T mod R) * N' mod R   (dense Toeplitz matmul, truncated)
        m_acc = jnp.matmul(
            _bf16(t_lo), self.toep_np, preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        m, _ = carry_exact(m_acc, 2)  # drop overflow: mod R
        m = m[..., :L]
        # S = T + m*p ; divisible by R, S/R < 2p
        mp = jnp.matmul(
            _bf16(m), self.toep_p, preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        S = Tc + mp
        Sc, _ = carry_exact(S, 2)
        hi = Sc[..., L : 2 * L]
        return self._cond_sub_p(hi)

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    # -- conversions ---------------------------------------------------------
    def to_mont(self, a):
        return self.mont_mul(a, jnp.broadcast_to(self.r2_limbs, a.shape))

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mont_mul(a, one)

    # -- predicates / select --------------------------------------------------
    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, cond, if_true, if_false):
        return jnp.where(cond[..., None], if_true, if_false)

    # -- exponentiation -------------------------------------------------------
    def pow_const(self, a, e: int):
        """a^e (Montgomery in/out) via scan over the fixed exponent bits."""
        assert e >= 1
        bits = np.array([int(b) for b in bin(e)[2:]], dtype=np.int32)

        def scan_body(acc, bit):
            acc = self.mont_sqr(acc)
            mulv = self.mont_mul(acc, a)
            acc = jnp.where(bit > 0, mulv, acc)
            return acc, None

        acc, _ = jax.lax.scan(scan_body, a, jnp.asarray(bits[1:]))
        return acc

    def inv(self, a):
        """Batched inversion via Fermat (a^(p-2)); inv(0) = 0 (total)."""
        return self.pow_const(a, self.p - 2)

    def batch_inverse(self, a):
        """Montgomery-trick batched inversion along axis 0 via a log-depth
        product tree: ~3 muls/element + ONE Fermat inversion.  Zero entries
        pass through as zero (total).  a: (N, L) Montgomery."""
        n = a.shape[0]
        one = jnp.broadcast_to(self.one_mont, a.shape)
        zmask = self.is_zero(a)
        x = jnp.where(zmask[..., None], one, a)
        # up-sweep: levels[k] holds products of 2^k-blocks
        levels = [x]
        while levels[-1].shape[0] > 1:
            cur = levels[-1]
            m = cur.shape[0]
            if m % 2:
                cur = jnp.concatenate([cur, one[:1]], axis=0)
                m += 1
            nxt = self.mont_mul(cur[0::2], cur[1::2])
            levels.append(nxt)
        total_inv = self.inv(levels[-1][0:1])
        # down-sweep: inv of each node from parent inv and sibling value
        invs = total_inv
        for lvl in range(len(levels) - 2, -1, -1):
            cur = levels[lvl]
            m = cur.shape[0]
            me = m if m % 2 == 0 else m + 1
            curp = (
                cur
                if me == m
                else jnp.concatenate([cur, one[:1]], axis=0)
            )
            left = curp[0::2]
            right = curp[1::2]
            inv_left = self.mont_mul(invs, right)
            inv_right = self.mont_mul(invs, left)
            merged = jnp.stack([inv_left, inv_right], axis=1).reshape(
                me, self.L
            )
            invs = merged[:m]
        return jnp.where(zmask[..., None], jnp.zeros_like(a), invs)

    # -- host conversion ------------------------------------------------------
    # Montgomery form conversion happens HOST-side (one bigint mulmod per
    # element): device-side to_mont/from_mont at pack time would trigger a
    # minutes-long XLA compile per new batch shape on the remote backend.
    def pack(self, ints, mont: bool = True):
        p = self.p
        if mont:
            R = 1 << (LIMB_BITS * self.L)
            vals = [x % p * R % p for x in ints]
        else:
            vals = [x % p for x in ints]
        return jnp.asarray(batch_to_limbs8(vals, self.L))

    def unpack(self, arr, mont: bool = True) -> list:
        vals = batch_from_limbs8(np.asarray(arr))
        if mont:
            p = self.p
            rinv = pow(1 << (LIMB_BITS * self.L), p - 2, p)
            vals = [v * rinv % p for v in vals]
        return vals


@functools.lru_cache(maxsize=None)
def field8(p: int) -> Fp8TPU:
    return Fp8TPU(p)


# ---------------------------------------------------------------------------
# device-side representation converters (16-bit planes <-> 8-bit planes)
# ---------------------------------------------------------------------------


def limbs16_to_8(a16, L8: int):
    """(..., L16) 16-bit planes -> (..., L8) 8-bit planes (on device)."""
    lo = a16 & MASK
    hi = (a16 >> 8) & MASK
    out = jnp.stack([lo, hi], axis=-1).reshape(*a16.shape[:-1], -1)
    L = out.shape[-1]
    if L < L8:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, L8 - L)])
    return out[..., :L8].astype(jnp.int32)


def limbs8_to_16(a8, L16: int):
    """(..., L8) 8-bit planes -> (..., L16) 16-bit planes (on device)."""
    L = a8.shape[-1]
    if L % 2:
        a8 = jnp.pad(a8, [(0, 0)] * (a8.ndim - 1) + [(0, 1)])
        L += 1
    pairs = a8.reshape(*a8.shape[:-1], L // 2, 2)
    out = pairs[..., 0] + (pairs[..., 1] << 8)
    if out.shape[-1] < L16:
        out = jnp.pad(
            out, [(0, 0)] * (out.ndim - 1) + [(0, L16 - out.shape[-1])]
        )
    return out[..., :L16].astype(jnp.int32)
