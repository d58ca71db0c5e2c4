"""Round-2 MSM engine on the 8-bit limb-plane field core (ff/fp8.py).

Replaces libff's Pippenger multiexp (SURVEY.md section 2b; burned under
generate_proof, reference aggregator_circuit.tcc:168) with a TPU-first
design:

  * signed c-bit windows (balanced digits in [-2^(c-1), 2^(c-1)]), digit
    extraction ON DEVICE from 8-bit limb planes — scalars never round-trip
    through host bigints;
  * per window: one argsort by bucket id, then LOG-DEPTH pairwise
    same-bucket combining: every round pairs each even-rank element with
    its odd-rank neighbour (full-width batched adds in the COMPLETE
    Renes–Costello–Batina projective law: 12 muls, branch-free — vs ~23
    muls + a select ladder for the round-2 unified Jacobian law), compacts
    survivors with a cumsum/searchsorted gather, and halves every bucket's
    population — after ceil(log2 n) rounds each bucket holds <= 1 point,
    REGARDLESS of the digit distribution.  Early rounds are
    unrolled while the array shrinks; the tail runs as ONE value-driven
    lax.while_loop body at a fixed width (compile-time control) that
    stops as soon as every bucket is a singleton — average-case a few
    rounds instead of the worst-case log2(n) fixed schedule;
  * bucket-weighted reduction via a log-depth suffix scan
    (sum_b b*B_b = sum_k suffix_k) + binary tree, not a serial running sum;
  * all windows live in ONE flat array keyed by window*stride + bucket
    (no vmap): the whole MSM is a single sequence of full-width batched
    rounds, so the fused Pallas group-law kernels always see one flat
    batch axis at maximum width;
  * Horner window fold (c doublings + 1 add per window) as a lax.scan.

Everything (digits -> point) is ONE jit: no host round-trips.

TIMING SIDE-CHANNEL NOTE: the adaptive combining tail is a value-driven
lax.while_loop whose round count depends on the digit-collision structure
of the scalars, so MSM latency is (weakly) scalar-dependent.  The
reference's libff multiexp is likewise variable-time, so this is parity,
not a regression; deployments needing constant-time proving should pin the
tail to its worst-case round count (log2 of the tail width) instead.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import fp8
from ..ff import params as P
from .curve_jax import JacCurve, ProjCurve, jac_point

SENT = jnp.int32(0x7FFFFFFF)


# ---------------------------------------------------------------------------
# Fq2 over the 8-bit core (BLS12-377 G2)
# ---------------------------------------------------------------------------


class Fp28TPU:
    """Quadratic extension over Fp8TPU; elements (..., 2, L)."""

    def __init__(self, p: int, nr: int):
        self.base = fp8.Fp8TPU(p)
        self.p = p
        self.nr = nr % p
        R = 1 << (fp8.LIMB_BITS * self.base.L)
        self.nr_mont = jnp.asarray(
            fp8.to_limbs8(self.nr * R % p, self.base.L)
        )
        self.L = self.base.L

    def consts(self):
        return {"base": self.base.consts(), "nr": self.nr_mont}

    import contextlib as _ctx

    @_ctx.contextmanager
    def bound(self, c):
        old_nr = self.nr_mont
        self.nr_mont = c["nr"]
        try:
            with self.base.bound(c["base"]):
                yield
        finally:
            self.nr_mont = old_nr

    def zero(self, shape=()):
        return jnp.zeros((*shape, 2, self.L), dtype=jnp.int32)

    def one_mont_elem(self):
        one = self.base.one_mont
        return jnp.stack([one, jnp.zeros_like(one)], axis=0)

    def _per_coeff(self, op, a, b=None):
        if b is None:
            return jnp.stack(
                [op(a[..., 0, :]), op(a[..., 1, :])], axis=-2
            )
        return jnp.stack(
            [
                op(a[..., 0, :], b[..., 0, :]),
                op(a[..., 1, :], b[..., 1, :]),
            ],
            axis=-2,
        )

    def add(self, a, b):
        return self._per_coeff(self.base.add, a, b)

    def sub(self, a, b):
        return self._per_coeff(self.base.sub, a, b)

    def neg(self, a):
        return self._per_coeff(self.base.neg, a)

    def double(self, a):
        return self.add(a, a)

    def mont_mul(self, a, b):
        B = self.base
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t0 = B.mont_mul(a0, b0)
        t1 = B.mont_mul(a1, b1)
        mid = B.sub(
            B.sub(B.mont_mul(B.add(a0, a1), B.add(b0, b1)), t0), t1
        )
        nr = jnp.broadcast_to(self.nr_mont, t1.shape)
        c0 = B.add(t0, B.mont_mul(t1, nr))
        return jnp.stack([c0, mid], axis=-2)

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def select(self, cond, if_true, if_false):
        return jnp.where(cond[..., None, None], if_true, if_false)

    def pack(self, tuples, mont: bool = True):
        flat = []
        for c0, c1 in tuples:
            flat.append(c0)
            flat.append(c1)
        arr = self.base.pack(flat, mont=mont)
        return arr.reshape(len(tuples), 2, self.L)

    def unpack(self, arr, mont: bool = True):
        n = arr.shape[0]
        flat = self.base.unpack(arr.reshape(n * 2, self.L), mont=mont)
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(n)]


@functools.lru_cache(maxsize=None)
def g1_curve8(curve_name: str) -> JacCurve:
    assert P.CURVES[curve_name].a == 0, (
        "msm8 uses a=0 group-law kernels (BLS12-377/BW6-761); MNT curves "
        "take the host/native path"
    )
    return JacCurve(fp8.field8(P.CURVES[curve_name].q))


@functools.lru_cache(maxsize=None)
def g2_curve8(curve_name: str) -> JacCurve:
    cp = P.CURVES[curve_name]
    if cp.g2_degree == 1:  # BW6-761: G2 coordinates live in Fq itself
        return JacCurve(fp8.field8(cp.q))
    assert curve_name == "bls12-377", "msm8 G2 supports a=0 curves only"
    return JacCurve(Fp28TPU(cp.q, P.BLS12_377_FQ2_QNR))


@functools.lru_cache(maxsize=None)
def g1_pcurve8(curve_name: str) -> ProjCurve:
    """Complete-formula (RCB) projective curve — the round-3 combining
    engine (12-mul branch-free adds vs ~23 for the unified Jacobian law)."""
    cp = P.CURVES[curve_name]
    assert cp.a == 0, "RCB a=0 law; MNT curves take the host/native path"
    b3 = {1: 3, cp.q - 1: -3}[cp.b]
    return ProjCurve(fp8.field8(cp.q), b3)


@functools.lru_cache(maxsize=None)
def g2_pcurve8(curve_name: str) -> ProjCurve:
    cp = P.CURVES[curve_name]
    if cp.g2_degree == 1:  # BW6-761 M-twist: y^2 = x^3 + 4 over Fq
        return ProjCurve(fp8.field8(cp.q), 12)
    assert curve_name == "bls12-377", "msm8 G2 supports a=0 curves only"
    F2 = Fp28TPU(cp.q, P.BLS12_377_FQ2_QNR)
    # D-twist: y^2 = x^3 + b/u with b=1, u^2 = -5 -> b2 = (0, -1/5)
    c1 = (-3 * pow(5, cp.q - 2, cp.q)) % cp.q
    return ProjCurve(F2, F2.pack([(0, c1)])[0])


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def pack_points_affine8(curve_name: str, pts: Sequence, g2: bool = False):
    """Host affine points (or None) -> {"x","y","inf"} 8-bit device arrays."""
    cp = P.CURVES[curve_name]
    if g2 and cp.g2_degree != 1:
        F = g2_curve8(curve_name).F
        zero = (0, 0)
        xs = [zero if pt is None else pt[0] for pt in pts]
        ys = [zero if pt is None else pt[1] for pt in pts]
    else:
        F = fp8.field8(cp.q)
        xs = [0 if pt is None else pt[0] for pt in pts]
        ys = [0 if pt is None else pt[1] for pt in pts]
    inf = jnp.asarray(np.array([pt is None for pt in pts], dtype=bool))
    return {"x": F.pack(xs), "y": F.pack(ys), "inf": inf}


def unpack_jac_point8(curve_name: str, pt_dev, g2: bool = False):
    """One device Jacobian point -> host affine tuple (or None)."""
    from . import host_curve as hc

    cp = P.CURVES[curve_name]
    if g2 and cp.g2_degree != 1:
        F = g2_curve8(curve_name).F
        fq = hc.g2_curve(curve_name).F
        x = F.unpack(pt_dev["x"][None])[0]
        y = F.unpack(pt_dev["y"][None])[0]
        z = F.unpack(pt_dev["z"][None])[0]
        if fq.is_zero(z):
            return None
    else:
        F = fp8.field8(cp.q)
        fq = hc.g1_curve(curve_name).F
        x = F.unpack(pt_dev["x"][None, :])[0]
        y = F.unpack(pt_dev["y"][None, :])[0]
        z = F.unpack(pt_dev["z"][None, :])[0]
        if z == 0:
            return None
    zinv = fq.inv(z)
    zinv2 = fq.sqr(zinv)
    return (fq.mul(x, zinv2), fq.mul(y, fq.mul(zinv2, zinv)))


# ---------------------------------------------------------------------------
# device-side signed digit extraction
# ---------------------------------------------------------------------------


def num_windows(nbits: int, c: int) -> int:
    """Window count with one extra bit of headroom for the balanced-digit
    carry out of the top window."""
    return -(-(nbits + 1) // c)


def signed_digits_from_limbs8(scal8, nbits: int, c: int):
    """(n, L) std-form 8-bit scalar limbs -> (W, n) buckets, (W, n) signs.

    Balanced representation: raw c-bit digits d are rewritten so each lies
    in [-2^(c-1), 2^(c-1)] with a +1 carry into the next window; bucket id
    is |d| (0 = no-op), sign 1 means subtract the point.
    """
    n, L = scal8.shape
    W = num_windows(nbits, c)
    half = 1 << (c - 1)
    full = 1 << c

    def raw_digit(w):
        o = c * w
        k, sh = o // 8, o % 8

        def byte(i):
            if i < L:
                return scal8[:, i].astype(jnp.int32)
            return jnp.zeros((n,), jnp.int32)

        v = byte(k) + (byte(k + 1) << 8) + (byte(k + 2) << 16)
        return (v >> sh) & (full - 1)

    buckets, signs = [], []
    carry = jnp.zeros((n,), jnp.int32)
    for w in range(W):
        d = raw_digit(w) + carry
        over = d > half
        carry = over.astype(jnp.int32)
        d = jnp.where(over, d - full, d)
        signs.append((d < 0).astype(jnp.int32))
        buckets.append(jnp.abs(d))
    return jnp.stack(buckets), jnp.stack(signs)


# ---------------------------------------------------------------------------
# the MSM kernel
# ---------------------------------------------------------------------------


def _round_schedule(n: int, K: int, max_unroll: int = 6):
    """Unrolled combining-round widths.

    After round t every bucket holds <= ceil(n / 2^t) elements and the
    compacted array holds <= ceil(n/2^t) + K live entries.  Compile-time
    control (every distinct round width is a separately compiled kernel
    site): unroll only the fast-shrinking rounds; the tail runs as a
    value-driven lax.while_loop at the last width (see msm8_core), which
    stops as soon as every bucket is a singleton — average-case O(1)
    extra rounds instead of the round-2 fixed worst-case log2(n) scan
    schedule (measured ~2.4x the n*W optimal add count, dominated by
    those fixed-width tails).
    """
    sizes = []
    t = 0
    while t < max_unroll:
        nxt = -(-n // (1 << (t + 1))) + K + 1
        if nxt >= (sizes[-1] if sizes else n):
            break
        sizes.append(nxt)
        t += 1
    return sizes


def _gather_pt(pt, idx):
    return {k: v[idx] for k, v in pt.items()}


def _compact_indices(keep, out_size):
    """Indices of the first ``out_size`` kept entries (+validity mask)."""
    csum = jnp.cumsum(keep.astype(jnp.int32))
    total = csum[-1]
    j = jnp.arange(out_size, dtype=jnp.int32)
    g = jnp.searchsorted(csum, j + 1, side="left").astype(jnp.int32)
    valid = (j + 1) <= total
    g = jnp.clip(g, 0, keep.shape[0] - 1)
    return g, valid


def _pair_flags(keys):
    """(can_pair, keep) for one combining round over sorted keys.

    Rank-in-segment via a cummax over segment-start positions — a couple
    of log-depth vector passes.  (The round-2 searchsorted(keys, keys)
    formulation lowered to per-element binary-search gathers on TPU and
    dominated the combining rounds' non-kernel time.)"""
    s = keys.shape[0]
    iota = jnp.arange(s, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -9, jnp.int32), keys[:-1]])
    start = keys != prev
    first = jax.lax.cummax(jnp.where(start, iota, 0))
    rank = iota - first
    even = (rank & 1) == 0
    nxt = jnp.concatenate([keys[1:], jnp.full((1,), -7, jnp.int32)])
    can_pair = even & (nxt == keys) & (keys != SENT)
    keep = even & (keys != SENT)
    return can_pair, keep


def _cat_pt(pts):
    """{"x","y","z"} -> one (n, 3L)-ish concatenated-coordinate array.
    The combining rounds thread THIS form: TPU gathers are per-ROW-
    overhead bound (measured ~90 ns/row regardless of width), so one
    wide-row gather costs a third of three narrow ones — and keeping the
    points concatenated avoids a full-width re-concat every round (which
    doubled peak HBM)."""
    return jnp.concatenate([pts["x"], pts["y"], pts["z"]], axis=-1)


def _split_pt(cat):
    L = cat.shape[-1] // 3
    return {
        "x": cat[..., :L],
        "y": cat[..., L : 2 * L],
        "z": cat[..., 2 * L :],
    }


def _gather_pt_wide(cat, idx):
    return _split_pt(cat[idx])


def _from_affine_cat(crv, aff):
    """Signed sorted affine points -> concatenated projective rows,
    without materializing the intermediate {"x","y","z"} dict at full
    width (the selects fuse into the concat)."""
    F = crv.F
    one = jnp.broadcast_to(F.one_mont_elem(), aff["y"].shape)
    inf = aff["inf"]
    return jnp.concatenate(
        [
            F.select(inf, jnp.zeros_like(aff["x"]), aff["x"]),
            F.select(inf, one, aff["y"]),
            F.select(inf, jnp.zeros_like(one), one),
        ],
        axis=-1,
    )


def _combine_round(crv, keys, cat, out_size):
    """One pairwise same-bucket combining round over concatenated-
    coordinate points (projective law for ProjCurve)."""
    can_pair, keep = _pair_flags(keys)
    g, valid = _compact_indices(keep, out_size)
    s = keys.shape[0]
    new_keys = jnp.where(valid, keys[g], SENT)
    p1 = _gather_pt_wide(cat, g)
    g2i = jnp.clip(g + 1, 0, s - 1)
    p2 = _gather_pt_wide(cat, g2i)
    p2 = crv.mask(p2, can_pair[g] & valid)
    p1 = crv.mask(p1, valid)
    return new_keys, _cat_pt(crv.add(p1, p2))


def _axis0_tree_reduce(crv, pts):
    """Binary-tree sum along axis 0 of (K, ..., L)-leading point arrays
    (other axes ride along as batch).  Unrolled log2(K) rounds."""
    n = pts["x"].shape[0]
    while n > 1:
        half = n // 2
        even = {k: v[: 2 * half : 2] for k, v in pts.items()}
        odd = {k: v[1 : 2 * half : 2] for k, v in pts.items()}
        summed = crv.add(even, odd)
        if n % 2:
            tail = {k: v[2 * half : n] for k, v in pts.items()}
            summed = {
                k: jnp.concatenate([v, tail[k]], axis=0)
                for k, v in summed.items()
            }
            n = half + 1
        else:
            n = half
        pts = summed
    return {k: v[0] for k, v in pts.items()}


def _build_sorted_affine(F, buckets, signs, pts_aff, c: int):
    """Digits -> (sorted composite keys, matching signed affine points).

    Shared by msm8_core and scripts/msm_ablate.py so the ablation always
    times exactly the graph the production MSM runs.  Composite key =
    window*stride + bucket; SENT for zero digits / infinity inputs."""
    W, n = buckets.shape
    K = 1 << (c - 1)
    stride = K + 2
    N = W * n
    wids = jnp.arange(W, dtype=jnp.int32)[:, None]
    key = jnp.where(
        pts_aff["inf"][None, :] | (buckets == 0),
        SENT,
        wids * stride + buckets,
    ).astype(jnp.int32)
    keyf = key.reshape(N)
    order = jnp.argsort(keyf)
    keys = keyf[order]
    src = order % n  # original point index
    neg = (signs.reshape(N)[order] > 0) & (keys != SENT)
    # negate y at the SOURCE width n (the carry network at the flat width
    # W*n cost ~2.5 GB per Kogge-Stone intermediate at BW6 padding —
    # round-3 OOM), then ONE wide-row gather + a cheap select between the
    # gathered y / -y lanes (see _gather_pt_wide on gather row costs)
    yneg = F.neg(pts_aff["y"])
    cat = jnp.concatenate([pts_aff["x"], pts_aff["y"], yneg], axis=-1)
    L = pts_aff["x"].shape[-1]
    r = cat[src]
    aff = {
        "x": r[..., :L],
        "y": F.select(neg, r[..., 2 * L :], r[..., L : 2 * L]),
        "inf": keys == SENT,
    }
    return keys, aff


def msm8_core(crv, F, buckets, signs, pts_aff, c: int,
              out_jacobian: bool = True):
    """(W, n) buckets/signs + affine points -> MSM result point.

    Flat composite-key formulation: all W windows are accumulated in ONE
    sorted array keyed by window*stride + bucket, so the whole MSM is a
    single sequence of full-width batched rounds (no vmap — the fused
    Pallas group-law kernels see one flat batch axis).

    ``crv`` is a ProjCurve/PallasProjCurve: every group op is the COMPLETE
    Renes–Costello–Batina law (12 muls, branch-free) — round 2's unified
    Jacobian adds cost ~23 muls plus a select ladder.  Output is Jacobian
    (one 3-mul conversion at the end) unless ``out_jacobian=False`` (the
    sharded path reduces the projective partials across devices first)."""
    W, n = buckets.shape
    K = 1 << (c - 1)
    stride = K + 2
    N = W * n
    wids = jnp.arange(W, dtype=jnp.int32)[:, None]
    keys, aff = _build_sorted_affine(F, buckets, signs, pts_aff, c)

    # pairwise same-bucket combining rounds (projective throughout;
    # points travel in the concatenated-coordinate form, see _cat_pt)
    pts = _from_affine_cat(crv, aff)
    sizes = _round_schedule(N, W * K)
    for s_next in sizes:
        keys, pts = _combine_round(crv, keys, pts, s_next)

    # adaptive tail: keep combining (at the last fixed width) until every
    # bucket holds one entry.  Value-driven stop — uniform digits finish
    # in ~log2(mean bucket population) rounds; adversarial skew (all-equal
    # digits) still terminates since each round halves every population.
    w_tail = keys.shape[0]

    def tail_cond(carry):
        ks, _ = carry
        return jnp.any((ks[:-1] == ks[1:]) & (ks[:-1] != SENT))

    def tail_body(carry):
        ks, ps = carry
        return _combine_round(crv, ks, ps, w_tail)

    keys, pts = jax.lax.while_loop(tail_cond, tail_body, (keys, pts))

    # dense bucket extraction in (M, G, W) chunked layout:
    # bucket id b = hi*G + g + 1 (hi chunk index, g in-chunk index)
    G = min(K, 64)
    M = K // G
    bk = jnp.arange(1, K + 1, dtype=jnp.int32)[:, None]  # (K, 1)
    ids = (bk + wids.T * stride).reshape(-1)  # (K*W,) bucket-major
    pos = jnp.searchsorted(keys, ids, side="left").astype(jnp.int32)
    posc = jnp.clip(pos, 0, keys.shape[0] - 1)
    hit = (pos < keys.shape[0]) & (keys[posc] == ids)
    bpts = crv.mask(_gather_pt_wide(pts, posc), hit)
    bpts = {k: v.reshape(M, G, W, *v.shape[1:]) for k, v in bpts.items()}

    # weighted bucket reduction, compile-lean:
    #   sum_b b*B_b = G * sum_g (sum_hi hi*B[hi,g]) + sum_g (g+1)*C_g
    # Each scan step's adds are independent given the carry, so they are
    # STACKED into one batched kernel call per step (halves/thirds the
    # per-step launch latency that dominated these phases in round 2).
    def _stacked_add(parts_a, parts_b):
        sizes_ = [a["x"].shape[0] for a in parts_a]
        cat = lambda vs: {
            k: jnp.concatenate([v[k] for v in vs], axis=0) for k in vs[0]
        }
        out = crv.add(cat(parts_a), cat(parts_b))
        res, off = [], 0
        for s_ in sizes_:
            res.append({k: v[off : off + s_] for k, v in out.items()})
            off += s_
        return res

    # scan 1 (over chunks, high to low): per-(g, w) lane
    #   wacc += run ; run += B[hi]   ->  wacc = sum hi*B,  run = C
    def chunk_body(carry, b_hi):
        run, wacc = carry
        wacc, run = _stacked_add([wacc, run], [run, b_hi])
        return (run, wacc), None

    # projective identity (0:1:0) — plain zeros are not a valid point for
    # the complete formulas
    zero_gw = crv.identity_like({k: v[0] for k, v in bpts.items()})
    rev_chunks = jax.tree_util.tree_map(lambda v: jnp.flip(v, 0), bpts)
    (col_sums, wsums), _ = jax.lax.scan(
        chunk_body, (zero_gw, zero_gw), rev_chunks
    )

    # scan 2 (over in-chunk index, high to low): per-w lane
    #   acc2 += run2 ; run2 += C_g ; wtot += W1_g
    def g_body(carry, xs):
        run2, acc2, wtot = carry
        c_g, w1_g = xs
        acc2, run2, wtot = _stacked_add(
            [acc2, run2, wtot], [run2, c_g, w1_g]
        )
        return (run2, acc2, wtot), None

    zero_w = crv.identity_like({k: v[0] for k, v in col_sums.items()})
    rev_g = (
        jax.tree_util.tree_map(lambda v: jnp.flip(v, 0), col_sums),
        jax.tree_util.tree_map(lambda v: jnp.flip(v, 0), wsums),
    )
    (run2, acc2, wtot), _ = jax.lax.scan(
        g_body, (zero_w, zero_w, zero_w), rev_g
    )
    # total = acc2 + run2 + G * wtot   (G = 2^g2: one fused doubling chain)
    g2bits = G.bit_length() - 1
    gw = crv.dbl_chain(wtot, g2bits)
    partials = crv.add(crv.add(acc2, run2), gw)  # (W, ...) window sums

    # Horner fold, most-significant window first; the c doublings per
    # window run as ONE fused chain launch instead of c width-1 launches
    rev = jax.tree_util.tree_map(lambda x: jnp.flip(x, 0), partials)

    def fold(acc, part):
        acc = crv.dbl_chain(acc, c)
        return crv.add(acc, part), None

    acc0 = crv.identity_like({k: v[0] for k, v in rev.items()})
    acc, _ = jax.lax.scan(fold, acc0, rev)
    if out_jacobian:
        return crv.to_jacobian(acc)
    return acc


# ---------------------------------------------------------------------------
# jitted entry points
# ---------------------------------------------------------------------------


def default_window(n: int) -> int:
    """Bucket-window width: balances accumulation adds (W*n) against the
    fixed-width combining tail + weighted reduction (both ~W*2^(c-1))."""
    if n <= 1 << 10:
        return 7
    if n <= 1 << 13:
        return 9
    if n <= 1 << 16:
        return 11
    if n <= 1 << 19:
        return 13
    return 15


def _pallas_supported(curve_name: str, g2: bool) -> bool:
    if not g2 or P.CURVES[curve_name].g2_degree == 1:
        return True
    # BLS12-377 G2 runs on the Fq2 kernel family
    return curve_name == "bls12-377"


@functools.lru_cache(maxsize=None)
def msm8_jit(curve_name: str, g2: bool, c: int,
             use_pallas: bool | None = None, bt: int = 0,
             w_range: tuple | None = None):
    """(scal8 std-form (n, Lr) 8-bit limbs, pts_aff) -> Jacobian point.

    ``use_pallas``: route the group-law through the fused VMEM kernels
    (ec_pallas).  Default: on for non-CPU backends when the curve is
    supported (a=0 families).  ``w_range=(lo, hi)``: accumulate only
    windows [lo, hi) — the caller scales the partial by 2^(c*lo) and sums
    (bounds peak HBM: the flat working set is ~(hi-lo)*n entries).
    """
    from ..utils.jit_utils import bound_jit

    if use_pallas is None:
        use_pallas = (
            jax.default_backend() != "cpu"
            and _pallas_supported(curve_name, g2)
        )
    if use_pallas:
        from . import ec_pallas

        assert _pallas_supported(curve_name, g2)
        crv = ec_pallas.PallasProjCurve(
            curve_name, bt=bt or ec_pallas.DEFAULT_BT, g2=g2
        )
    else:
        crv = g2_pcurve8(curve_name) if g2 else g1_pcurve8(curve_name)
    nbits = P.CURVES[curve_name].r.bit_length()

    if w_range is None:

        def run(scal8, pts_aff):
            buckets, signs = signed_digits_from_limbs8(scal8, nbits, c)
            return msm8_core(crv, crv.F, buckets, signs, pts_aff, c)

        return bound_jit([crv.F], run)

    # chunked variant: w_lo is a TRACED argument (one compiled graph per
    # (n, c, chunk width) — all chunks share it); width is static
    w_count = w_range[1] - w_range[0]

    def run_chunk(scal8, pts_aff, w_lo):
        buckets, signs = signed_digits_from_limbs8(scal8, nbits, c)
        # pad the window axis: a tail chunk slices zero-windows (no-ops)
        buckets = jnp.pad(buckets, ((0, w_count), (0, 0)))
        signs = jnp.pad(signs, ((0, w_count), (0, 0)))
        buckets = jax.lax.dynamic_slice_in_dim(buckets, w_lo, w_count, 0)
        signs = jax.lax.dynamic_slice_in_dim(signs, w_lo, w_count, 0)
        return msm8_core(crv, crv.F, buckets, signs, pts_aff, c)

    return bound_jit([crv.F], run_chunk)


@functools.lru_cache(maxsize=None)
def msm8_streamed_jit(curve_name: str, g2: bool, c: int, chunks: int,
                      use_pallas: bool | None = None, bt: int = 0):
    """ONE-jit window-streamed MSM (round-3 replacement for the host-side
    window chunking): digits are extracted ONCE, a lax.scan walks the
    window chunks (peak HBM = a single chunk's flat working set — the
    scan body's buffers are reused across iterations), and a second scan
    Horner-folds the chunk partials with fused 2^(c*per) doubling chains.
    Round 2's msm8_chunked_host re-extracted digits per chunk (2x overhead
    at chunks=2) and round-tripped every partial through the host."""
    from ..utils.jit_utils import bound_jit

    if use_pallas is None:
        use_pallas = (
            jax.default_backend() != "cpu"
            and _pallas_supported(curve_name, g2)
        )
    if use_pallas:
        from . import ec_pallas

        assert _pallas_supported(curve_name, g2)
        crv = ec_pallas.PallasProjCurve(
            curve_name, bt=bt or ec_pallas.DEFAULT_BT, g2=g2
        )
    else:
        crv = g2_pcurve8(curve_name) if g2 else g1_pcurve8(curve_name)
    nbits = P.CURVES[curve_name].r.bit_length()
    W = num_windows(nbits, c)
    per = -(-W // chunks)

    def run(scal8, pts_aff):
        buckets, signs = signed_digits_from_limbs8(scal8, nbits, c)
        pad = chunks * per - W
        n = scal8.shape[0]
        buckets = jnp.pad(buckets, ((0, pad), (0, 0)))
        signs = jnp.pad(signs, ((0, pad), (0, 0)))
        bch = buckets.reshape(chunks, per, n)
        sch = signs.reshape(chunks, per, n)

        def body(_, xs):
            b, s = xs
            part = msm8_core(
                crv, crv.F, b, s, pts_aff, c, out_jacobian=False
            )
            return 0, part

        _, parts = jax.lax.scan(body, 0, (bch, sch))

        # Horner across chunks, most-significant chunk first:
        # total = sum_k 2^(c*per*k) * part_k
        rev = jax.tree_util.tree_map(lambda v: jnp.flip(v, 0), parts)

        def fold(acc, part):
            acc = crv.dbl_chain(acc, c * per)
            return crv.add(acc, part), None

        acc0 = crv.identity_like({k: v[0] for k, v in rev.items()})
        acc, _ = jax.lax.scan(fold, acc0, rev)
        return crv.to_jacobian(acc)

    return bound_jit([crv.F], run)


def msm8_chunked_host(curve_name: str, g2: bool, c: int, scal8, pts_aff,
                      chunks: int, use_pallas: bool | None = None,
                      bt: int = 0):
    """Window-chunked MSM: run ``chunks`` partial MSMs over window ranges
    (bounding peak device memory) and combine on host:
        total = sum_k [2^(c*lo_k)] partial_k
    Returns a HOST affine point (or None)."""
    from . import host_curve as hc

    import jax.numpy as jnp

    W = num_windows(P.CURVES[curve_name].r.bit_length(), c)
    crv_h = hc.g2_curve(curve_name) if g2 else hc.g1_curve(curve_name)
    per = -(-W // chunks)
    # pad the window axis so every chunk has the same width (digits beyond
    # W-1 read as zero -> contribute nothing); ONE compiled graph total
    fn = msm8_jit(curve_name, g2, c, use_pallas, bt, (0, per))
    total = None
    for lo in range(0, W, per):
        part_dev = fn(scal8, pts_aff, jnp.int32(lo))
        part = unpack_jac_point8(curve_name, part_dev, g2=g2)
        if part is not None:
            for _ in range(c * lo):
                part = crv_h.dbl(part)
        if total is None:
            total = part
        elif part is not None:
            total = crv_h.add(total, part)
    return total


def msm8(curve_name: str, scalars: Sequence[int], points: Sequence,
         g2: bool = False, c: int = 0, use_pallas: bool | None = None,
         bt: int = 0):
    """Host-convenience MSM (scalars/points in, affine host point out)."""
    r = P.CURVES[curve_name].r
    n = len(points)
    c = c or default_window(n)
    Fr = fp8.field8(r)
    scal8 = Fr.pack([s % r for s in scalars], mont=False)
    pts = pack_points_affine8(curve_name, points, g2=g2)
    acc = msm8_jit(curve_name, g2, c, use_pallas, bt)(scal8, pts)
    return unpack_jac_point8(curve_name, acc, g2=g2)
