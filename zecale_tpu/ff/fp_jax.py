"""Batched Montgomery field arithmetic on limb planes — the JAX/XLA compute
path (runs on TPU; CPU backend in tests).

Elements: int32 arrays of shape (..., L), L 16-bit limbs, little-endian,
canonically reduced (< p, limbs < 2^16) at every public-op boundary, and in
Montgomery form a*R mod p, R = 2^(16 L), for mul-domain values.

Core trick — carry-free Montgomery REDC via convolutions:

    T   = a (*) b                      (schoolbook convolution)
    m   = carry(T mod R) (*) N' mod R  (N' = -p^-1 mod R)
    out = (T + m (*) p) / R            (exact division; single carry pass)

All convolutions are limb-parallel: 16x16-bit partial products are exact in
uint32, split into lo/hi 16-bit halves, cast to f32 and contracted against a
constant 0/1 "anti-diagonal" matrix — the big-int multiply rides the MXU as
an f32 matmul (Precision.HIGHEST keeps it exact on TPU), with every
accumulator < 2^23 (exact in f32).  The only sequential steps are short
carry ripples (~L cheap vector ops each).

This replaces libff's GMP-backed Fp (SURVEY.md section 2b), designed for the
TPU datapath rather than translated.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limb as lb

LIMB_BITS = lb.LIMB_BITS
MASK = lb.LIMB_MASK


@functools.lru_cache(maxsize=None)
def _conv_matrices(L: int):
    """0/1 f32 matrices mapping flattened outer products to convolutions.

    OH_lo[(i*L+j), k] = [i+j == k];  OH_hi[(i*L+j), k] = [i+j+1 == k].
    """
    K = 2 * L
    lo = np.zeros((L * L, K), dtype=np.float32)
    hi = np.zeros((L * L, K), dtype=np.float32)
    for i in range(L):
        for j in range(L):
            lo[i * L + j, i + j] = 1.0
            if i + j + 1 < K:
                hi[i * L + j, i + j + 1] = 1.0
    # NB: cache NUMPY arrays -- caching jnp arrays created inside a jit trace
    # would leak tracers into later traces.
    return lo, hi


def _conv(a, b, L: int):
    """Exact convolution of 16-bit-limb vectors -> (..., 2L) i32 accumulators
    (each < 2^23).  Requires limbs of a and b in [0, 2^16)."""
    oh_lo_np, oh_hi_np = _conv_matrices(L)
    oh_lo, oh_hi = jnp.asarray(oh_lo_np), jnp.asarray(oh_hi_np)
    prod = (
        a.astype(jnp.uint32)[..., :, None] * b.astype(jnp.uint32)[..., None, :]
    )
    lo = (prod & MASK).astype(jnp.float32).reshape(*prod.shape[:-2], L * L)
    hi = (prod >> LIMB_BITS).astype(jnp.float32).reshape(
        *prod.shape[:-2], L * L
    )
    acc = jnp.matmul(
        lo, oh_lo, precision=jax.lax.Precision.HIGHEST
    ) + jnp.matmul(hi, oh_hi, precision=jax.lax.Precision.HIGHEST)
    return acc.astype(jnp.int32)


def _carry(acc, out_limbs: int):
    """Ripple-carry an i32 accumulator vector into canonical 16-bit limbs.

    Arithmetic right-shifts make borrow (negative limbs) work too.  The
    final position holds whatever carry remains (callers size out_limbs so
    that it is small and non-negative for in-range values).

    Implemented as a lax.scan over the limb axis (one compact HLO node:
    unrolled ripple loops made compile times explode at L=24..48 limbs).
    """
    K = acc.shape[-1]
    if K < out_limbs:
        pad = [(0, 0)] * (acc.ndim - 1) + [(0, out_limbs - K)]
        acc = jnp.pad(acc, pad)
    seq = jnp.moveaxis(acc[..., :out_limbs], -1, 0)  # (out_limbs, ...)

    def step(c, x):
        t = x + c
        return t >> LIMB_BITS, t & MASK

    c, outs = jax.lax.scan(step, jnp.zeros(acc.shape[:-1], jnp.int32), seq[:-1])
    last = (seq[-1] + c)[None]
    return jnp.moveaxis(jnp.concatenate([outs, last], axis=0), 0, -1)


class FpTPU:
    """Montgomery Fp over a fixed modulus, batched over leading dims."""

    def __init__(self, p: int):
        mp = lb.mont_params(p)
        self.p = p
        self.L = mp.L
        L = self.L
        R = 1 << (LIMB_BITS * L)
        nprime = (-pow(p, -1, R)) % R
        self.p_limbs = jnp.asarray(mp.p_limbs.astype(np.int32))
        self.np_limbs = jnp.asarray(lb.to_limbs(nprime, L).astype(np.int32))
        self.r2_limbs = jnp.asarray(mp.r2_limbs.astype(np.int32))
        self.one_mont = jnp.asarray(mp.one_mont_limbs.astype(np.int32))
        self.pcomp_limbs = jnp.asarray(lb.to_limbs(R - p, L).astype(np.int32))

    # ------------------------------------------------------------------
    # Constant binding: the XLA-TPU (axon) compiler pathologically
    # constant-folds graphs where a convolution operand is a literal, so hot
    # paths must receive the per-modulus constants as jit ARGUMENTS.  A
    # bound_jit wrapper (zecale_tpu.utils.jit_utils) passes consts() at call
    # time and enters bound() while tracing.
    _CONST_ATTRS = ("p_limbs", "np_limbs", "r2_limbs", "one_mont", "pcomp_limbs")

    def consts(self):
        return {a: getattr(self, a) for a in self._CONST_ATTRS}

    @contextlib.contextmanager
    def bound(self, c):
        old = {a: getattr(self, a) for a in self._CONST_ATTRS}
        for a in self._CONST_ATTRS:
            setattr(self, a, c[a])
        try:
            yield
        finally:
            for a in self._CONST_ATTRS:
                setattr(self, a, old[a])

    # ------------------------------------------------------------------
    def zero(self, shape=()):
        return jnp.zeros((*shape, self.L), dtype=jnp.int32)

    def one_mont_elem(self):
        """The field's 1 in Montgomery form as a (L,) element (rides the
        constant-binding protocol, so safe inside bound_jit traces)."""
        return self.one_mont

    def _reduce_once(self, low, top):
        """value = low + top*R (low canonical, top in {0,1}, value < 2p)
        -> value mod p, canonical."""
        acc = low + self.pcomp_limbs
        carried = _carry(acc, self.L + 1)
        ge_p = (carried[..., self.L] + top) > 0
        return jnp.where(ge_p[..., None], carried[..., : self.L], low)

    # -- public ops (operands canonical; Montgomery domain for mul) ---------
    def add(self, a, b):
        s = _carry(a + b, self.L + 1)
        return self._reduce_once(s[..., : self.L], s[..., self.L])

    def sub(self, a, b):
        s = _carry(a - b + self.p_limbs, self.L + 1)
        return self._reduce_once(s[..., : self.L], s[..., self.L])

    def neg(self, a):
        return self.sub(self.zero(a.shape[:-1]), a)

    def double(self, a):
        return self.add(a, a)

    def mont_mul(self, a, b):
        L = self.L
        T = _conv(a, b, L)  # (..., 2L) accumulators < 2^23
        # m = carry-normalized (T mod R) * N' mod R, with T-limb fat handling
        t_low = T[..., :L]
        t_lo = t_low & MASK
        t_hi = t_low >> LIMB_BITS  # < 2^7
        np_b = jnp.broadcast_to(self.np_limbs, t_lo.shape)
        m_acc = _conv(t_lo, np_b, L)[..., :L] + jnp.pad(
            _conv(t_hi, np_b, L)[..., : L - 1],
            [(0, 0)] * (t_hi.ndim - 1) + [(1, 0)],
        )
        m = _carry(m_acc, L + 1)[..., :L]  # normalized => m < R
        mN = _conv(m, jnp.broadcast_to(self.p_limbs, m.shape), L)
        S = T + mN  # each limb < 2^24; S == 0 mod R as an integer
        carried = _carry(S, 2 * L + 1)
        hi = carried[..., L : 2 * L]
        top = carried[..., 2 * L]
        # result = hi + top*R < (T + mN)/R < p^2/R + p < 2p
        return self._reduce_once(hi, top)

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
        """cond: (...) bool; elements (..., L)."""
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
        """Batched inversion via Fermat (a^(p-2)); Montgomery in/out.
        inv(0) = 0 (total)."""
        return self.pow_const(a, self.p - 2)

    # -- host conversion ------------------------------------------------------
    def _mont_convert_jit(self):
        if not hasattr(self, "_mont_conv_fn"):
            from ..utils.jit_utils import bound_jit

            self._mont_conv_fn = bound_jit(
                [self],
                lambda a, to: jnp.where(
                    to, self.to_mont(a), self.from_mont(a)
                ),
            )
        return self._mont_conv_fn

    def pack(self, ints, mont: bool = True):
        arr = jnp.asarray(
            lb.batch_to_limbs([x % self.p for x in ints], self.L).astype(
                np.int32
            )
        )
        if not mont:
            return arr
        return self._mont_convert_jit()(arr, True)

    def unpack(self, arr, mont: bool = True) -> list:
        if mont:
            arr = self._mont_convert_jit()(arr, False)
        return lb.batch_from_limbs(np.asarray(arr))


@functools.lru_cache(maxsize=None)
def field(p: int) -> FpTPU:
    return FpTPU(p)
