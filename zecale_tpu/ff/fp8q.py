"""Lazy ("quick") Montgomery arithmetic on transposed 8-bit limb planes.

Round-4 kernel core (VERDICT r3 items 1+2).  Same limb representation as
ff/fp8t.py — (L, ...) int32 arrays of canonical 8-bit limbs, limb axis
first — but values live in the RELAXED range [0, k*p) for a small
per-value static bound k instead of [0, p).  This removes the conditional
subtract (a Kogge-Stone pass + select) from EVERY add/sub/mul: the
round-3 kernels spent roughly half their VPU time in carry networks, and
cond_sub_p was ~40% of that.

Soundness rules (statically tracked by the caller through each formula):

  * add_q(a, b):      k_out = ka + kb          (one KS pass)
  * sub_q(a, b, kb):  a - b + kb*p, k_out = ka + kb
  * neg_q(a, ka):     ka*p - a, k_out = ka
  * mont_mul_q(a, b): requires ka*kb <= R/p (= 128 for both BLS12-377 Fq
    and BW6-761 Fq: p < 2^(8L-7)); k_out = 2.
  * redc_q(T_acc, m): REDC of a sum of <= m raw conv accumulators with
    sum of ka*kb products <= 128; k_out = 1 + ceil(sum/128) (<= 2 for
    sum <= 128).  Lets group-law formulas fuse x = a*b + c*d into ONE
    REDC (conv accumulators add per-limb; convolution is bilinear so the
    (a+b)(c+d) - ac - bd pattern is also per-limb non-negative).
  * reduce_half_q(a, ka): one conditional subtract of ceil(ka/2)*p;
    k_out = ceil(ka/2).  Used sparingly where products would exceed 128.

R/p >= 128 holds for every modulus this framework runs hot (BLS12-377
q/r, BW6-761 q, MNT4/6 q/r all have bit length <= 8L - 7 after the
even-L rounding in fp8.Fp8TPU); guarded in make_qconsts.

Replaces the hot-path role of the strict ops for the round-4 MSM kernels
(ec/msm4*.py); the strict fp8t ops remain the public-boundary form.
Reference analog: libff's Fp arithmetic under multiexp
(/root/reference SURVEY.md section 2b), which likewise uses redundant
Montgomery tricks in GMP assembly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import fp8
from .fp8t import (
    MASK,
    carry16_exact_t,
    carry_exact_t,
    kogge_stone_t,
    _inc_limb0,
)

#: largest k for which k*p limb constants are tabulated
KMAX = 64

#: array-valued quick constants (ride the consts()/bound() jit-arg
#: protocol alongside fp8t.TC_ARRAYS)
QC_ARRAYS = ("kp", "comp_kp")


def make_qconsts(F: "fp8.Fp8TPU") -> dict:
    """k*p tables for a modulus: kp[k-1] = limbs of k*p, comp_kp[k-1] =
    255 - those limbs (for conditional-subtract complements)."""
    L = F.L
    # Coordinate fields only: BLS12-377 Fq (L=48) and BW6-761 Fq (L=96)
    # both have >= 7 limb-headroom bits (R/p >= 128).  Scalar fields like
    # BLS12-377 Fr (3 bits) are NOT supported — the MSM kernels never do
    # field arithmetic in Fr (scalars only feed digit extraction).
    assert (128 * F.p) < (1 << (8 * L)), (
        "lazy Montgomery needs p < R/128 (coordinate fields only)"
    )
    rows = np.stack([fp8.to_limbs8(k * F.p, L) for k in range(1, KMAX + 1)])
    return {
        "kp": jnp.asarray(rows),
        "comp_kp": jnp.asarray(MASK - rows),
    }


def _kp(tc, k: int, ndim: int):
    """Limbs of k*p broadcast-shaped (L, 1, ..., 1) for ``ndim`` dims."""
    assert 1 <= k <= KMAX, k
    v = tc["kp"][k - 1]
    return v.reshape(v.shape[0], *([1] * (ndim - 1)))


def _comp_kp(tc, k: int, ndim: int):
    v = tc["comp_kp"][k - 1]
    return v.reshape(v.shape[0], *([1] * (ndim - 1)))


def add_q(a, b):
    """a + b; k_out = ka + kb.  One KS pass, no conditional subtract.

    (A 16-bit carry domain — fp8t.carry16_exact_t — was measured SLOWER
    on chip: the sublane pair-combine/split relayouts cost more than the
    halved Kogge-Stone.  Byte-domain carries stay.)"""
    s, _ = kogge_stone_t(a + b)
    return s


def triple_q(a):
    """3a in one carry pass (limbs <= 765 -> one fold + KS)."""
    s, _ = carry_exact_t(a + a + a, 1)
    return s[: a.shape[0]]


def dbl_q(a):
    return add_q(a, a)


def sub_q(a, b, kb: int, tc):
    """a - b + kb*p (requires b < kb*p); k_out = ka + kb."""
    t = _inc_limb0(a + (MASK - b) + _kp(tc, kb, a.ndim))
    s, _ = carry_exact_t(t, 1)
    return s[: a.shape[0]]


def neg_q(a, ka: int, tc):
    """ka*p - a; k_out = ka."""
    t = _inc_limb0((MASK - a) + _kp(tc, ka, a.ndim))
    s, _ = carry_exact_t(t, 1)
    return s[: a.shape[0]]


def reduce_half_q(a, ka: int, tc):
    """Conditional subtract of m*p with m = ceil(ka/2): k_out = m."""
    m = (ka + 1) // 2
    t = _inc_limb0(a + _comp_kp(tc, m, a.ndim))
    sub, no_borrow = kogge_stone_t(t)
    return jnp.where((no_borrow > 0)[None], sub, a)


def redc_q(T, tc):
    """Montgomery REDC of a raw (2L, ...)-accumulator (i32 limb sums from
    one or more fp8t.conv_ab_t calls, per-limb non-negative, value
    < 128*p^2).  Output: canonical limbs, value < 2p (k=2 when the conv
    k-product sum is <= 128).  NO trailing conditional subtract.

    ZECALE_REDC16=1 routes the three carry resolutions through the 16-bit
    carry domain (half the rows, one fewer Kogge-Stone step).  MEASURED
    SLOWER on chip (round-5 ablation, BLS n=2^18 reduce: 1416 ms vs 1217
    byte-domain): the pair-combine/split relayouts outweigh the saved
    steps, the same trade add_q documents.  Kept as a measurement flag
    for other hardware generations."""
    import os as _os

    L = tc["L"]
    trail = T.shape[1:]
    if _os.environ.get("ZECALE_REDC16"):
        def _carry(acc):
            out, _ = carry16_exact_t(acc, 1)
            return out
    else:
        def _carry(acc):
            out, _ = carry_exact_t(acc, 2)
            return out

    Tc = _carry(T)[: 2 * L]
    m_acc = jnp.matmul(
        tc["toep_np_t"],
        Tc[:L].reshape(L, -1).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32).reshape(L, *trail)
    m = _carry(m_acc)
    mp = jnp.matmul(
        tc["toep_p_t"],
        m[:L].reshape(L, -1).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32).reshape(2 * L, *trail)
    Sc = _carry(Tc + mp)
    return Sc[L : 2 * L]


def mont_mul_q(a, b, tc):
    from .fp8t import conv_ab_t

    return redc_q(conv_ab_t(a, b, tc), tc)


def canon_q(a, ka: int, tc):
    """Fold a k*p-bounded value into canonical [0, p): repeated halving
    conditional subtracts (log2(ka) KS passes) then the final cond_sub."""
    from .fp8t import cond_sub_p_t

    while ka > 2:
        a = reduce_half_q(a, ka, tc)
        ka = (ka + 1) // 2
    if ka == 2:
        a = cond_sub_p_t(a, tc)
    return a


# ---------------------------------------------------------------------------
# field-ops objects for kernel bodies (k-tracked values)
# ---------------------------------------------------------------------------


class QOps:
    """Base-field lazy ops on (L, ...) transposed limb planes.

    Callers track k bounds statically; conv/redc expose accumulator-space
    fusion.  ``tc`` is the fp8t transposed-constants dict extended with
    make_qconsts arrays."""

    def __init__(self, tc):
        self.tc = tc

    def conv(self, a, b):
        from .fp8t import conv_ab_t

        return conv_ab_t(a, b, self.tc)

    def redc(self, T):
        return redc_q(T, self.tc)

    def mul(self, a, b):
        return mont_mul_q(a, b, self.tc)

    def sqr(self, a):
        return mont_mul_q(a, a, self.tc)

    def add(self, a, b):
        return add_q(a, b)

    def dbl(self, a):
        return dbl_q(a)

    def triple(self, a):
        return triple_q(a)

    def sub(self, a, b, kb):
        return sub_q(a, b, kb, self.tc)

    def neg(self, a, ka):
        return neg_q(a, ka, self.tc)

    def reduce_half(self, a, ka):
        return reduce_half_q(a, ka, self.tc)

    def canon(self, a, ka):
        return canon_q(a, ka, self.tc)

    def select(self, cond, t, f):
        return jnp.where(cond[None], t, f)

    def one_like(self, a):
        one = self.tc["one_mont"]
        return jnp.broadcast_to(
            one.reshape(one.shape[0], *([1] * (a.ndim - 1))), a.shape
        )

    def zero_like(self, a):
        return jnp.zeros_like(a)


class QOps2:
    """Fq2 lazy ops on (2L, ...) stacked coordinate planes (c0 then c1).

    Karatsuba mul with accumulator-space combination: the three base
    convs are combined per-limb (non-negative by bilinearity) before ONE
    REDC per output coordinate.  The non-residue multiply for c0 rides as
    an extra conv against the Montgomery nr constant."""

    def __init__(self, tc, nr_t):
        self.tc = tc
        self.nr_t = nr_t  # (L, 1) Montgomery non-residue limbs
        self.L = tc["L"]

    def _split(self, a):
        return a[: self.L], a[self.L :]

    def _cat(self, c0, c1):
        return jnp.concatenate([c0, c1], axis=0)

    def _per(self, fn, a, b=None):
        a0, a1 = self._split(a)
        if b is None:
            return self._cat(fn(a0), fn(a1))
        b0, b1 = self._split(b)
        return self._cat(fn(a0, b0), fn(a1, b1))

    def add(self, a, b):
        return self._per(add_q, a, b)

    def dbl(self, a):
        return self._per(dbl_q, a)

    def triple(self, a):
        return self._per(triple_q, a)

    def sub(self, a, b, kb):
        return self._per(lambda x, y: sub_q(x, y, kb, self.tc), a, b)

    def neg(self, a, ka):
        return self._per(lambda x: neg_q(x, ka, self.tc), a)

    def reduce_half(self, a, ka):
        return self._per(lambda x: reduce_half_q(x, ka, self.tc), a)

    def canon(self, a, ka):
        return self._per(lambda x: canon_q(x, ka, self.tc), a)

    def mul(self, a, b):
        """c1 = a0b1 + a1b0 as a DIRECT conv-space sum (one REDC), c0 =
        a0b0 + nr*(a1b1) likewise.  Conv accumulators of canonical-limb
        operands are per-limb non-negative, so they add safely before one
        REDC each.  (Subtractive Karatsuba does NOT compose with the
        unsigned carry network here: canonicalizing a0+a1 changes limb
        patterns, so tm - t0 - t1 goes per-limb negative — the same trap
        proj_add_q documents for the (a+b)(c+d)-ac-bd cross terms.)

        Bound: inputs ka, kb per coordinate; every conv product is
        <= ka*kb*p^2, each REDC sum <= 2*ka*kb + 2 products; the caller
        budget in _mul_budget/_mul_kout keeps k_out <= 4."""
        from .fp8t import conv_ab_t

        tc = self.tc
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        c1 = redc_q(
            conv_ab_t(a0, b1, tc) + conv_ab_t(a1, b0, tc), tc
        )
        # c0 = a0b0 + nr * a1b1: redc(a1b1) (< 2p) then a conv against
        # the canonical nr constant, summed with a0b0 in conv space.
        u1 = redc_q(conv_ab_t(a1, b1, tc), tc)
        nr = jnp.broadcast_to(
            self.nr_t.reshape(self.L, *([1] * (u1.ndim - 1))), u1.shape
        )
        c0 = redc_q(conv_ab_t(a0, b0, tc) + conv_ab_t(u1, nr, tc), tc)
        return self._cat(c0, c1)

    def sqr(self, a):
        return self.mul(a, a)

    def select(self, cond, t, f):
        return jnp.where(cond[None], t, f)

    def one_like(self, a):
        one = self.tc["one_mont"]
        one = jnp.broadcast_to(
            one.reshape(self.L, *([1] * (a.ndim - 1))),
            (self.L, *a.shape[1:]),
        )
        return jnp.concatenate([one, jnp.zeros_like(one)], axis=0)

    def zero_like(self, a):
        return jnp.zeros_like(a)


# ---------------------------------------------------------------------------
# lazy complete group law (RCB16, a=0) with static k bookkeeping
# ---------------------------------------------------------------------------


class KVal:
    """A limb tensor paired with its static bound k (value < k*p).

    All bookkeeping is Python-level (trace-time): the helpers below insert
    reduce_half passes automatically whenever a product would exceed the
    REDC input budget, so the formula bodies are in-bounds by
    construction."""

    __slots__ = ("v", "k")

    def __init__(self, v, k: int):
        self.v = v
        self.k = k


def _q_reduce_until(F, a: KVal, kmax: int) -> KVal:
    while a.k > kmax:
        a = KVal(F.reduce_half(a.v, a.k), (a.k + 1) // 2)
    return a


def _mul_budget(F) -> int:
    """Largest ka*kb the ops object's mul accepts with k_out <= 4."""
    return 96 if isinstance(F, QOps2) else 128


def _mul_kout(F, prod: int) -> int:
    if isinstance(F, QOps2):
        # worst coordinate: c1's REDC input < 2*ka*kb*p^2
        return max(2, 1 + -(-2 * prod // 128))
    return 2


def qmul(F, a: KVal, b: KVal) -> KVal:
    budget = _mul_budget(F)
    while a.k * b.k > budget:
        if a.k >= b.k:
            a = KVal(F.reduce_half(a.v, a.k), (a.k + 1) // 2)
        else:
            b = KVal(F.reduce_half(b.v, b.k), (b.k + 1) // 2)
    return KVal(F.mul(a.v, b.v), _mul_kout(F, a.k * b.k))


def qadd(F, a: KVal, b: KVal) -> KVal:
    assert a.k + b.k <= 128
    return KVal(F.add(a.v, b.v), a.k + b.k)


def qsub(F, a: KVal, b: KVal) -> KVal:
    assert a.k + b.k <= 128 and b.k <= KMAX
    return KVal(F.sub(a.v, b.v, b.k), a.k + b.k)


def qneg(F, a: KVal) -> KVal:
    return KVal(F.neg(a.v, a.k), a.k)


def qdbl(F, a: KVal) -> KVal:
    return KVal(F.dbl(a.v), 2 * a.k)


def qtriple(F, a: KVal) -> KVal:
    return KVal(F.triple(a.v), 3 * a.k)


def _mul_b3(F, t, kt: int, b3):
    """b3*t for b3 in {3, -3, 12} (small: carry-level ops) or a packed
    Montgomery constant (Fq2 twist).  Returns (value, k_out)."""
    if not isinstance(b3, int):
        b3c = jnp.broadcast_to(
            b3.reshape(b3.shape[0], *([1] * (t.ndim - 1))), t.shape
        )
        return F.mul(t, b3c), 2
    if b3 == 3:
        return F.triple(t), 3 * kt
    if b3 == -3:
        return F.neg(F.triple(t), 3 * kt), 3 * kt
    assert b3 == 12
    v, k = F.triple(t), 3 * kt
    if k > 16:
        v, k = F.reduce_half(v, k), (k + 1) // 2
    v, k = F.dbl(F.dbl(v)), 4 * k
    if k > 24:
        v, k = F.reduce_half(v, k), (k + 1) // 2
    return v, k


def _qmul_b3(F, t: KVal, b3) -> KVal:
    v, k = _mul_b3(F, t.v, t.k, b3)
    return KVal(v, k)


def _fused2(F, a: KVal, b: KVal, c: KVal, d: KVal, neg_second=False):
    """a*b + c*d (or a*b - c*d via negating c) as ONE REDC in conv space
    for the base field; two muls + add/sub for Fq2.  Auto-reduces
    operands so the REDC input stays within the k<=4 output budget."""
    if isinstance(F, QOps2):
        # keep each product's k_out at 2 so the sum closes at k<=4
        while a.k * b.k > 64:
            big = max((a, b), key=lambda x: x.k)
            big.v, big.k = F.reduce_half(big.v, big.k), (big.k + 1) // 2
        while c.k * d.k > 64:
            big = max((c, d), key=lambda x: x.k)
            big.v, big.k = F.reduce_half(big.v, big.k), (big.k + 1) // 2
        m1 = qmul(F, a, b)
        m2 = qmul(F, c, d)
        return qsub(F, m1, m2) if neg_second else qadd(F, m1, m2)
    while a.k * b.k + c.k * d.k > 384:  # k_out = 1 + ceil(sum/128) <= 4
        big = max((a, b, c, d), key=lambda x: x.k)
        big.v, big.k = F.reduce_half(big.v, big.k), (big.k + 1) // 2
    if neg_second:
        c = qneg(F, c)
    s = a.k * b.k + c.k * d.k
    out = F.redc(F.conv(a.v, b.v) + F.conv(c.v, d.v))
    return KVal(out, 1 + -(-s // 128))


def proj_add_q(F, p, q, b3):
    """Complete projective P+Q (RCB16 alg 7, a=0) in lazy arithmetic.

    Inputs: coordinate dicts with values bounded k<=4 (identity (0,1,0)
    and affine-derived leaves are k=1).  Output bounded k<=4 — a fixed
    point, so the law iterates freely in tree reductions and scans.

    Fusions vs the strict kernel body (ec_pallas._proj_add_t):
      * the three (a+b)(c+d) - ac - bd lines run in conv-accumulator
        space (per-limb non-negative by bilinearity — convolution is
        bilinear, so the combined accumulator equals conv(X1,Y2) +
        conv(X2,Y1) termwise): one REDC each, no standalone subs;
      * x3/y3/z3 = (m1) +- (m2) pairs fuse into one REDC per output.
    Saves 5 REDCs + ~10 carry passes per add vs the strict body, plus
    the per-op cond_subs the lazy representation removes globally.
    """
    IN_K = 4
    X1 = KVal(p["x"], IN_K)
    Y1 = KVal(p["y"], IN_K)
    Z1 = KVal(p["z"], IN_K)
    X2 = KVal(q["x"], IN_K)
    Y2 = KVal(q["y"], IN_K)
    Z2 = KVal(q["z"], IN_K)
    small = not isinstance(F, QOps2) and isinstance(b3, int)

    if small:
        # Cross terms as DIRECT two-conv sums: conv accumulators of
        # canonical-limb operands are per-limb >= 0, so they add safely
        # before ONE REDC.  (The textbook (a+b)(c+d) - ac - bd form does
        # NOT work here: canonicalizing a+b changes the limb pattern, so
        # the subtraction goes per-limb negative and breaks the unsigned
        # carry network — caught by the P+(-P) differential test.)
        t0 = KVal(F.redc(F.conv(X1.v, X2.v)), 2)
        t1 = KVal(F.redc(F.conv(Y1.v, Y2.v)), 2)
        t2 = KVal(F.redc(F.conv(Z1.v, Z2.v)), 2)
        t3 = KVal(
            F.redc(F.conv(X1.v, Y2.v) + F.conv(Y1.v, X2.v)), 2
        )
        t4 = KVal(
            F.redc(F.conv(Y1.v, Z2.v) + F.conv(Z1.v, Y2.v)), 2
        )
        y3 = KVal(
            F.redc(F.conv(X1.v, Z2.v) + F.conv(Z1.v, X2.v)), 2
        )
    else:
        t0 = qmul(F, X1, X2)
        t1 = qmul(F, Y1, Y2)
        t2 = qmul(F, Z1, Z2)
        t3 = qsub(F, qmul(F, qadd(F, X1, Y1), qadd(F, X2, Y2)),
                  qadd(F, t0, t1))
        t4 = qsub(F, qmul(F, qadd(F, Y1, Z1), qadd(F, Y2, Z2)),
                  qadd(F, t1, t2))
        y3 = qsub(F, qmul(F, qadd(F, X1, Z1), qadd(F, X2, Z2)),
                  qadd(F, t0, t2))

    t0t = qtriple(F, t0)
    t2b = _qmul_b3(F, t2, b3)
    z3 = qadd(F, t1, t2b)
    t1 = qsub(F, t1, t2b)
    y3b = _qmul_b3(F, y3, b3)

    x3 = _fused2(F, t3, t1, t4, y3b, neg_second=True)
    y3o = _fused2(F, y3b, t0t, t1, z3)
    z3o = _fused2(F, z3, t4, t0t, t3)
    assert max(x3.k, y3o.k, z3o.k) <= 4, (x3.k, y3o.k, z3o.k)
    return {"x": x3.v, "y": y3o.v, "z": z3o.v}


def proj_dbl_q(F, p, b3):
    """Complete projective doubling (RCB16 alg 9, a=0), lazy; k<=4 fixed
    point like proj_add_q."""
    IN_K = 4
    X = KVal(p["x"], IN_K)
    Y = KVal(p["y"], IN_K)
    Z = KVal(p["z"], IN_K)
    t0 = qmul(F, Y, Y)
    z3 = qdbl(F, qdbl(F, qdbl(F, t0)))
    t1 = qmul(F, Y, Z)
    t2 = _qmul_b3(F, qmul(F, Z, Z), b3)
    x3 = qmul(F, t2, z3)
    y3 = qadd(F, t0, t2)
    z3 = qmul(F, t1, z3)
    t1 = qdbl(F, t2)
    t2 = qadd(F, t1, t2)
    t2 = _q_reduce_until(F, t2, KMAX - 2)
    t0 = qsub(F, t0, t2)
    y3o = _fused2_addend(F, x3, qmul(F, t0, y3))
    x3o = qdbl(F, qmul(F, t0, qmul(F, X, Y)))
    assert max(x3o.k, y3o.k, z3.k) <= 4, (x3o.k, y3o.k, z3.k)
    return {"x": x3o.v, "y": y3o.v, "z": z3.v}


def _fused2_addend(F, a: KVal, b: KVal) -> KVal:
    return qadd(F, a, b)
