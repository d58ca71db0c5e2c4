"""Round-4 MSM engine: sorted bucket matrix + lazy-Montgomery Pallas reduce.

Replaces the round-2/3 sort-and-compact engine (ec/msm8.py) on the hot
path.  The round-3 ablation blamed gathers/argsort, but re-measurement
with proper fencing (scripts/r4_probe.py) shows sort is ~15 ms and row
gathers are 15-30 ns/row on this chip — the real costs were the per-round
HBM round-trips (pair flags, compaction, re-gather at full width every
combining round) and the strict field ops' conditional subtracts.  This
engine removes both:

  pipeline (ONE jit, no host round-trips):
    1. signed c-bit digits on device (reused from msm8);
    2. per-window PACKED sort: key = (bucket-1) << (log2n+1) | sign <<
       log2n | idx fits int31, so jnp.sort of a single i32 array gives
       order + source index + sign in one pass (sign indexes a [y; -y]
       table half — no sign gather, no negation pass at flat width);
    3. bucket boundaries by searchsorted on the sorted keys (W*(K+1)
       scalar probes);
    4. ONE padded gather builds the dense bucket matrix: slot (w, b, s)
       reads the table row of the s-th point of bucket b (window w), or
       the all-zero identity row when s >= count.  int8 rows halve HBM
       footprint 4x vs i32 (BW6-761 streams would not fit otherwise);
    5. a Pallas kernel streams the matrix with plain grid BlockSpecs and
       reduces each bucket's capacity axis in VMEM: a fori_loop
       accumulates fixed-width strips (temporaries reused across
       iterations — Mosaic's stack allocator does not reuse across
       distinct shapes), then a short shrinking tree folds the strip
       accumulator.  All group ops are the LAZY complete RCB law
       (ff/fp8q.py): no per-op conditional subtracts, fused REDC pairs;
    6. weighted bucket reduction + Horner window fold in plain jnp
       lax.scans inside the same jit (small widths; XLA loops, not
       kernel launches).

  Identity handling: the complete projective law treats (0:1:0) exactly,
  so padding needs NO masks anywhere past the gather — pad slots hit an
  all-zero table row, detected as y == 0 (impossible for subgroup points:
  y = 0 implies 2-torsion) and mapped to the identity leaf.

  Adversarial bucket overflow (count > capacity C): a value-driven
  lax.while_loop runs extra layers over slots [l*C, (l+1)*C), combining
  layer partials at full width.  Uniform scalars never trigger it
  (C = avg + 6*sigma + slack); all-equal scalars degrade gracefully.

Reference analog: libff's multi_exp under wsnark::generate_proof
(/root/reference/libzecale/circuits/aggregator_circuit.tcc:168); SURVEY.md
section 2b "libff — multiexp".
"""

from __future__ import annotations

import dataclasses
import functools
import math
from os import environ as _os_env

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ff import fp8, fp8q, fp8t
from ..ff import params as P
from . import msm8

SENT = jnp.int32(0x7FFFFFFF)


# ---------------------------------------------------------------------------
# plan
# ---------------------------------------------------------------------------


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _merge_classes(K_j: int, a: tuple, b: tuple) -> tuple:
    """Element-wise max of two rank->S envelopes given as RLE class
    tuples ((S, m), ...), re-encoded as RLE covering K_j ranks."""

    def expand(cls):
        out = []
        for s, m in cls:
            out.extend([s] * m)
        out.extend([1] * (K_j - len(out)))
        return out[:K_j]

    ea, eb = expand(a), expand(b)
    merged = [max(x, y) for x, y in zip(ea, eb)]
    rle = []
    for s in merged:
        if rle and rle[-1][0] == s:
            rle[-1][1] += 1
        else:
            rle.append([s, 1])
    return tuple((s, m) for s, m in rle)


@dataclasses.dataclass(frozen=True)
class Msm4Plan:
    curve_name: str
    g2: bool
    n2: int          # points padded to a power of two
    c: int           # window bits
    W: int           # number of windows
    K: int           # buckets per window (2^(c-1), balanced digits)
    C: int           # bucket capacity (layer width)
    G: int           # (unused; kept for plan stability)
    B0: int          # slot rows folded per kernel grid step
    ew: int          # limbs per coordinate (L for Fq, 2L for Fq2)
    fq2: bool
    b3_small: int | None  # small b3, or None for the Fq2 twist constant
    # Per-window bucket-lane RANK LADDER: win_shapes[j] = (K_j, classes)
    # with classes = ((S, m), ...): the m buckets with the largest
    # counts (rank order, mapped DYNAMICALLY per call via an argsort of
    # the measured counts) each get S sub-lanes of capacity C; sub-lane
    # partials fold back and un-permute before the weighted reduction.
    # This one mechanism covers every skew source: high windows whose
    # digit span follows the modulus (the top real window takes values
    # < r >> (c*j); the carry-only window above it puts ~n/2 points in
    # ONE bucket) and bit-heavy witness scalars (bucket 1 of window 0
    # can hold 10^5 entries for circuit wires).  "Flat" windows
    # (classes == ((1, K),)) skip the permutation and batch together.
    win_shapes: tuple  # tuple of (K_j, ((S, m), ...)) per window

    @property
    def logn(self) -> int:
        return self.n2.bit_length() - 1

    @property
    def shift(self) -> int:
        return self.logn + 1  # sign bit + index bits

    @property
    def reg_wins(self) -> tuple:
        """Flat windows: one lane per bucket, no rank permutation."""
        return tuple(
            j for j, (k, cls) in enumerate(self.win_shapes)
            if k == self.K and cls == ((1, self.K),)
        )

    @property
    def skew_wins(self) -> tuple:
        return tuple(
            j for j, (k, cls) in enumerate(self.win_shapes)
            if not (k == self.K and cls == ((1, self.K),))
        )

    @staticmethod
    def win_lanes(shape) -> int:
        _, classes = shape
        return sum(s * m for s, m in classes)

    @property
    def lanes(self) -> int:
        """Total bucket lanes before GL padding."""
        return sum(self.win_lanes(ws) for ws in self.win_shapes)


def default_window4(n: int) -> int:
    """Bucket window for the dense-matrix engine: pad work scales like
    1 + 6/sqrt(n/2^(c-1)), window count like 1/c — the optimum sits at a
    few hundred points per bucket."""
    if n <= 1 << 10:
        return 6
    if n <= 1 << 14:
        return 8
    if n <= 1 << 16:
        return 10
    return 11


@functools.lru_cache(maxsize=None)
def make_plan(curve_name: str, g2: bool, n: int, c: int = 0,
              calib: tuple = ()) -> Msm4Plan:
    """``calib``: optional per-window sub-lane counts (from
    calibrate_slanes) overriding the uniform-scalar model.  Witness MSMs
    are NOT uniform — circuit wires are bit-heavy, so window 0's small
    buckets can hold 10^5 entries (the analytic plan then burns hundreds
    of capacity layers).  The prover measures real counts once per
    circuit and passes the quantized S_j tuple here."""
    cp = P.CURVES[curve_name]
    assert cp.a == 0, "msm4 serves the a=0 family (BLS12-377 / BW6-761)"
    n2 = _next_pow2(max(n, 256))
    c = c or default_window4(n2)
    # key packing must fit non-negative int32
    c = min(c, 30 - (n2.bit_length() - 1))
    assert c >= 2
    nbits = cp.r.bit_length()
    W = msm8.num_windows(nbits, c)
    K = 1 << (c - 1)
    fq2 = bool(g2 and cp.g2_degree == 2)
    L = fp8.field8(cp.q).L
    ew = 2 * L if fq2 else L
    # capacity: mean occupancy, a 1/8 span-skew margin (full windows are
    # classified so their modulus-induced skew is <= 1.0625x), 6 sigma,
    # slack; multiple of the strip width
    avg = max(1, n2 // K)
    # B0 trades grid-step count against VMEM (input block + double
    # buffer); the L=96 add body leaves only ~1 MB of stack headroom —
    # B0=8 put the calibrated BW6 witness-MSM kernel 236 KB over the
    # 16 MB scoped-vmem limit (AOT compile failure found by the round-5
    # batch-8 e2e; round 4 never ran this path), so wide coordinates use
    # B0=4 (the input double-buffer halves to ~390 KB)
    B0 = 32 if ew <= 48 else 4
    C = avg + avg // 8 + 6 * int(math.isqrt(avg)) + 8
    C = -(-C // B0) * B0
    G = 8
    # Per-window lane shapes from the EXACT digit-value span of r:
    # window j's raw digit is (s >> c*j) mod 2^c for s uniform < r, so
    # high windows concentrate mass on span_j ~ (r >> c*j) values.
    # Narrow-span windows (span < 16*2^c: the top real window(s) and the
    # carry window) get K_j buckets spread over S_j sub-lanes of
    # capacity C; full-span windows are regular (their <= 1.0625x skew
    # is inside C's margin).
    r_mod = cp.r
    win_shapes = []
    for jw in range(W):
        span = (r_mod >> (c * jw)) + 2
        if span >= (16 << c):
            K_j, classes = K, ((1, K),)
        else:
            per = -(-span // (1 << c))
            worst = min(n2, 2 * n2 * per // span + 1)
            need = min(n2, worst + 6 * int(math.isqrt(worst)) + 8)
            S_j = max(1, -(-need // C))
            K_j = min(K, span)
            classes = ((S_j, K_j),)
        if calib:
            # calibrated envelope (rank -> sub-lane count) from measured
            # counts; union with the analytic classes by taking the
            # element-wise max over ranks
            classes = _merge_classes(K_j, classes, calib[jw])
        win_shapes.append((K_j, classes))
    win_shapes = tuple(win_shapes)
    if fq2:
        b3_small = None
    else:
        b = 4 if (g2 and cp.g2_degree == 1) else cp.b
        b3_small = {1: 3, cp.q - 1: -3, 4: 12}[b]
    return Msm4Plan(
        curve_name=curve_name, g2=g2, n2=n2, c=c, W=W, K=K, C=C, G=G,
        B0=B0, ew=ew, fq2=fq2, b3_small=b3_small,
        win_shapes=win_shapes,
    )


# ---------------------------------------------------------------------------
# field/context plumbing
# ---------------------------------------------------------------------------


class _Fq2Ctx:
    """Holds the Fq2 non-residue + twist b3 constants with the
    consts()/bound() jit-argument protocol (axon const-folding hazard)."""

    def __init__(self, curve_name: str):
        cp = P.CURVES[curve_name]
        assert curve_name == "bls12-377"
        F = fp8.field8(cp.q)
        L = F.L
        R = 1 << (8 * L)
        self.nr_t = jnp.asarray(
            fp8.to_limbs8(P.BLS12_377_FQ2_QNR * R % cp.q, L).reshape(L, 1)
        )
        c1 = (-3 * pow(5, cp.q - 2, cp.q)) % cp.q
        self.b3_t = jnp.asarray(
            np.concatenate(
                [fp8.to_limbs8(0, L), fp8.to_limbs8(c1 * R % cp.q, L)]
            ).reshape(2 * L, 1)
        )

    def consts(self):
        return {"nr_t": self.nr_t, "b3_t": self.b3_t}

    import contextlib as _ctx

    @_ctx.contextmanager
    def bound(self, c):
        old = (self.nr_t, self.b3_t)
        self.nr_t, self.b3_t = c["nr_t"], c["b3_t"]
        try:
            yield
        finally:
            self.nr_t, self.b3_t = old


@functools.lru_cache(maxsize=None)
def _field_ctx(curve_name: str, fq2: bool):
    F = fp8.field8(P.CURVES[curve_name].q)
    if "kp" not in F.tc:
        F.tc.update(fp8q.make_qconsts(F))
    ctx = _Fq2Ctx(curve_name) if fq2 else None
    return F, ctx


def _make_ops(plan: Msm4Plan, tc, nr_t=None):
    if plan.fq2:
        return fp8q.QOps2(tc, nr_t)
    return fp8q.QOps(tc)


def _b3_of(plan: Msm4Plan, ctx):
    return plan.b3_small if not plan.fq2 else ctx.b3_t


# ---------------------------------------------------------------------------
# pipeline stages (pure jnp)
# ---------------------------------------------------------------------------


def _build_keys(plan: Msm4Plan, buckets, signs, inf):
    """(W, n2) packed sort keys; SENT for zero digits / infinity points."""
    W, n = buckets.shape
    pad = plan.n2 - n
    if pad:
        buckets = jnp.pad(buckets, ((0, 0), (0, pad)))
        signs = jnp.pad(signs, ((0, 0), (0, pad)))
        inf = jnp.pad(inf, (0, pad), constant_values=True)
    idx = jnp.arange(plan.n2, dtype=jnp.int32)[None, :]
    key = (
        ((buckets - 1) << plan.shift)
        | (signs << plan.logn)
        | idx
    )
    invalid = (buckets == 0) | inf[None, :]
    return jnp.where(invalid, SENT, key).astype(jnp.int32)


def _starts_counts(plan: Msm4Plan, skeys):
    bounds = (
        jnp.arange(plan.K + 1, dtype=jnp.int32) << plan.shift
    )
    starts = jax.vmap(
        lambda row: jnp.searchsorted(row, bounds, side="left")
    )(skeys).astype(jnp.int32)
    counts = starts[:, 1:] - starts[:, :-1]
    return starts, counts


def _rank_order(plan: Msm4Plan, counts, j: int):
    """Descending-count bucket permutation for a ladder window: order[r]
    = bucket index (0-based) of rank r, inv[b] = rank of bucket b."""
    K_j = plan.win_shapes[j][0]
    order = jnp.argsort(-counts[j, :K_j]).astype(jnp.int32)
    inv = jnp.argsort(order).astype(jnp.int32)
    return order, inv


def _class_ranks(classes):
    """[(S, rank_lo, rank_hi), ...] from the RLE class tuple."""
    out = []
    r0 = 0
    for s, m in classes:
        out.append((s, r0, r0 + m))
        r0 += m
    return out


def _padded_src(plan: Msm4Plan, skeys, starts, counts, layer,
                win_range=None):
    """(lanes*C,) table-row indices for one capacity layer, in window
    order.  Ladder windows assign rank r (by descending measured count,
    via _rank_order) S_r sub-lanes: slot (r, u, s) reads sorted entry
    starts[j, order[r]] + (layer*S_r + u)*C + s (identity row 2*n2 past
    the count).  Flat windows (S=1 everywhere) batch into one prefix
    gather.  ``win_range=(lo, hi)`` restricts to a window group
    (peak-HBM chunking)."""
    K, C = plan.K, plan.C
    lo, hi = win_range or (0, plan.W)
    mask = (1 << plan.shift) - 1
    idrow = 2 * plan.n2
    s = jnp.arange(C, dtype=jnp.int32)
    reg = [j for j in plan.reg_wins if lo <= j < hi]

    pieces = {}
    if reg:
        # flat windows are always a contiguous run; plain slices — the
        # equivalent row-gather form (skeys[jnp.asarray(reg)])
        # MISCOMPILES on the axon TPU backend at 2^18-scale shapes
        # (stride-patterned garbage, caught by the device-side
        # consistency check).
        r0, r1 = reg[0], reg[-1] + 1
        assert reg == list(range(r0, r1)), (
            "flat windows must form a contiguous slice"
        )
        n_reg = len(reg)
        off = layer * C + s[None, None, :]
        pos = starts[r0:r1, :-1, None] + off
        valid = off < counts[r0:r1, :, None]
        pos = jnp.clip(pos, 0, plan.n2 - 1)
        g = jnp.take_along_axis(
            skeys[r0:r1], pos.reshape(n_reg, K * C), axis=1
        ).reshape(n_reg, K, C)
        rblk = jnp.where(valid, g & mask, idrow)
        for i, j in enumerate(reg):
            pieces[j] = rblk[i].reshape(-1)

    for j in plan.skew_wins:
        if not (lo <= j < hi):
            continue
        K_j, classes = plan.win_shapes[j]
        order, _ = _rank_order(plan, counts, j)
        segs = []
        for S, ra, rb in _class_ranks(classes):
            bks = order[ra:rb]                       # (m,) bucket ids
            st = starts[j, :-1][bks]                 # (m,)
            ct = counts[j][bks]                      # (m,)
            u = jnp.arange(S, dtype=jnp.int32)
            off = (layer * S + u[None, :, None]) * C + s[None, None, :]
            pos = st[:, None, None] + off
            valid = off < ct[:, None, None]
            pos = jnp.clip(pos, 0, plan.n2 - 1)
            g = jnp.take_along_axis(
                skeys[j], pos.reshape(-1), axis=0
            ).reshape(rb - ra, S, C)
            segs.append(
                jnp.where(valid, g & mask, idrow).reshape(-1)
            )
        pieces[j] = jnp.concatenate(segs) if len(segs) > 1 else segs[0]

    return jnp.concatenate(
        [pieces[j] for j in range(lo, hi) if j in pieces]
    )


def _lane_needs(plan: Msm4Plan, counts, layer, win_range=None):
    """(lanes,) occupied-slot counts per bucket lane for one layer,
    mirroring _padded_src's lane order (drives the kernel strip-skip)."""
    C = plan.C
    lo, hi = win_range or (0, plan.W)
    reg = [j for j in plan.reg_wins if lo <= j < hi]
    pieces = {}
    if reg:
        r0, r1 = reg[0], reg[-1] + 1
        need = jnp.clip(counts[r0:r1] - layer * C, 0, C)
        for i, j in enumerate(reg):
            pieces[j] = need[i]
    for j in plan.skew_wins:
        if not (lo <= j < hi):
            continue
        K_j, classes = plan.win_shapes[j]
        order, _ = _rank_order(plan, counts, j)
        segs = []
        for S, ra, rb in _class_ranks(classes):
            ct = counts[j][order[ra:rb]]
            u = jnp.arange(S, dtype=jnp.int32)
            nd = jnp.clip(
                ct[:, None] - (layer * S + u[None, :]) * C, 0, C
            )
            segs.append(nd.reshape(-1))
        pieces[j] = jnp.concatenate(segs) if len(segs) > 1 else segs[0]
    return jnp.concatenate(
        [pieces[j] for j in range(lo, hi) if j in pieces]
    )


def _table_int8(plan: Msm4Plan, F, pts_aff):
    """(2*n2 + 8, 2*ew) int8 table: [x|y rows; x|-y rows; zero rows].

    The y-negation happens ONCE at source width n; the sign bit of the
    sort key selects the table half.  Row 2*n2 (all zeros) is the
    identity sentinel (y == 0 never occurs for subgroup points)."""
    x, y, inf = pts_aff["x"], pts_aff["y"], pts_aff["inf"]
    n = x.shape[0]
    if plan.fq2:
        x = x.reshape(n, plan.ew)
        y = y.reshape(n, plan.ew)
    # strict negation on the batch-major source (canonical, cheap at n)
    yneg = F.neg(y.reshape(-1, F.L)).reshape(y.shape)
    # zero out infinity rows so they can never alias a valid point
    keep = ~inf[:, None]
    rows_pos = jnp.where(keep, jnp.concatenate([x, y], axis=1), 0)
    rows_neg = jnp.where(keep, jnp.concatenate([x, yneg], axis=1), 0)
    pad = plan.n2 - n
    tbl = jnp.concatenate(
        [
            rows_pos,
            jnp.zeros((pad, 2 * plan.ew), jnp.int32),
            rows_neg,
            jnp.zeros((pad + 8, 2 * plan.ew), jnp.int32),
        ],
        axis=0,
    )
    return tbl.astype(jnp.int8)


# ---------------------------------------------------------------------------
# shared reduce math (used by the Pallas kernel body AND the jnp path)
# ---------------------------------------------------------------------------


def _leaves(ops, raw_i32, plan: Msm4Plan):
    """(2ew, ...) widened rows -> projective leaf point dict."""
    ew = plan.ew
    x = raw_i32[:ew]
    y = raw_i32[ew:]
    is_id = jnp.all(y == 0, axis=0)
    one = ops.one_like(y)
    zero = jnp.zeros_like(y)
    return {
        "x": ops.select(is_id, zero, x),
        "y": ops.select(is_id, one, y),
        "z": ops.select(is_id, zero, one),
    }


def _widen(raw_int8):
    return raw_int8.astype(jnp.int32) & 0xFF


# ---------------------------------------------------------------------------
# the bucket-reduce Pallas kernel
#
# Layout: LANES ARE BUCKETS.  The matrix arrives as (C, 2ew, KW): slot
# rows on the untiled major axis (freely indexable inside the kernel),
# coordinate limbs on sublanes, buckets on lanes.  Each accumulation step
# is ONE lazy complete add of width GL=256 bucket-lanes; a 2-D grid
# (bucket blocks x slot strips) streams the matrix while a VMEM scratch
# accumulator persists across the strip dimension.  No tree, no
# compaction, no lane waste, and every loop body has a fixed shape so
# Mosaic's stack allocator reuses one add's worth of temporaries.
# ---------------------------------------------------------------------------

GL = 256  # bucket lanes per block


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tc_inputs(F, ctx):
    """Ordered (names, arrays) of field constants fed to the kernel."""
    keys = sorted(F._tc_array_keys(F.tc))
    arrs = [F.tc[k] for k in keys]
    if ctx is not None:
        keys += ["nr_t", "b3_t"]
        arrs += [ctx.nr_t, ctx.b3_t]
    return keys, arrs


def bucket_reduce_pallas(plan: Msm4Plan, F, ctx, mat_int8, block_need):
    """(C, 2ew, KWp) int8 bucket matrix -> (KWp, 3ew) i32 lazy partials
    (KWp = bucket count padded to a multiple of GL).

    ``block_need``: (KWp/GL,) i32 — max occupied slots over each lane
    block; strips entirely past it skip their adds (the capacity C
    covers worst-case buckets, but a block's actual max is usually much
    lower — data-driven ~25-35% compute saving at no correctness cost
    since skipped strips hold only identity rows for every lane in the
    block)."""
    KW = mat_int8.shape[-1]
    C, ew = plan.C, plan.ew
    B0 = plan.B0
    n_strips = C // B0
    names, consts = _tc_inputs(F, ctx)
    static_tc = {
        k: v for k, v in F.tc.items() if isinstance(v, (int, bool))
    }

    def kernel(*refs):
        need_ref = refs[0]
        mat_ref = refs[1]
        const_refs = refs[2 : 2 + len(names)]
        out_ref = refs[-2]  # output block (GL, 3ew)
        acc_ref = refs[-1]  # scratch (3ew, GL) i32, persists over j
        j = pl.program_id(1)
        tc = dict(static_tc)
        cvals = {}
        for nm, ref in zip(names, const_refs):
            cvals[nm] = ref[:]
        for nm in names:
            if nm not in ("nr_t", "b3_t"):
                tc[nm] = cvals[nm]
        ops = _make_ops(plan, tc, cvals.get("nr_t"))
        b3 = plan.b3_small if not plan.fq2 else cvals["b3_t"]

        @pl.when(j == 0)
        def _():
            one = jnp.broadcast_to(
                ops.one_like(jnp.zeros((ew, GL), jnp.int32)), (ew, GL)
            )
            acc_ref[:] = jnp.concatenate(
                [jnp.zeros((ew, GL), jnp.int32), one,
                 jnp.zeros((ew, GL), jnp.int32)],
                axis=0,
            )

        # strip-skip: round 4 measured a net loss for L=48 G1 and gated
        # it to ew >= 96; re-measured in round 5 on the per-group
        # host-orchestrated pipeline it WINS at L=48 too (reduce stage
        # 1217 -> 946 ms on the BLS n=2^18 bench plan), so it now
        # defaults on everywhere (ZECALE_MSM4_SKIP_EW re-tunes).
        skip_ew = int(_os_env.get("ZECALE_MSM4_SKIP_EW", "48"))
        skip_pred = (
            (j * B0 < need_ref[pl.program_id(0)])
            if ew >= skip_ew else (j >= 0)
        )

        @pl.when(skip_pred)
        def _():
            def body(s, acc):
                leaf = _leaves(
                    ops, _widen(mat_ref[pl.ds(s, 1), :, :][0]), plan
                )
                return fp8q.proj_add_q(ops, acc, leaf, b3)

            acc0 = {
                "x": acc_ref[:ew],
                "y": acc_ref[ew : 2 * ew],
                "z": acc_ref[2 * ew :],
            }
            acc = jax.lax.fori_loop(0, B0, body, acc0)
            acc_ref[:] = jnp.concatenate(
                [acc["x"], acc["y"], acc["z"]], axis=0
            )

        @pl.when(j == n_strips - 1)
        def _():
            out_ref[:] = acc_ref[:].T

    cspecs = [
        pl.BlockSpec(c.shape, lambda i, j, nd=c.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for c in consts
    ]
    return pl.pallas_call(
        kernel,
        grid=(KW // GL, n_strips),
        in_specs=[
            pl.BlockSpec((KW // GL,), lambda i, j: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B0, 2 * ew, GL), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        + cspecs,
        out_specs=pl.BlockSpec((GL, 3 * ew), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KW, 3 * ew), jnp.int32),
        scratch_shapes=[pltpu.VMEM((3 * ew, GL), jnp.int32)],
        # The L=96 add body's conv temporaries put the Mosaic stack just
        # past the default 16 MB scoped-vmem limit (the calibrated BW6
        # witness-MSM kernel overflowed by 52 KB at B0=4 — AOT failure
        # found by the round-5 batch-8 e2e).  v5e has 128 MB of VMEM;
        # grant the kernel an explicit 100 MB budget instead of shrinking
        # B0 further (smaller blocks cost grid steps on EVERY msm).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(block_need, mat_int8, *consts)


def bucket_reduce_jnp(plan: Msm4Plan, F, ctx, mat_int8, block_need=None):
    """Reference path: identical math to the kernel — a lax.scan over the
    slot rows accumulating at full bucket width (tests / CPU).
    ``block_need`` is ignored: skipped strips hold only identity rows,
    so processing them changes nothing (the differential tests rely on
    this equivalence)."""
    ops = _make_ops(plan, F.tc, ctx.nr_t if ctx else None)
    b3 = _b3_of(plan, ctx)
    KW = mat_int8.shape[-1]
    ew = plan.ew

    def body(acc, row):
        leaf = _leaves(ops, _widen(row), plan)
        return fp8q.proj_add_q(ops, acc, leaf, b3), None

    one = jnp.broadcast_to(
        ops.one_like(jnp.zeros((ew, KW), jnp.int32)), (ew, KW)
    )
    acc0 = {
        "x": jnp.zeros((ew, KW), jnp.int32),
        "y": one,
        "z": jnp.zeros((ew, KW), jnp.int32),
    }
    acc, _ = jax.lax.scan(body, acc0, mat_int8)
    return jnp.concatenate(
        [acc["x"], acc["y"], acc["z"]], axis=0
    ).T


# ---------------------------------------------------------------------------
# epilogue: weighted bucket reduction + Horner (plain jnp, one jit)
# ---------------------------------------------------------------------------


def _split3(cat, ew):
    return {
        "x": cat[:ew],
        "y": cat[ew : 2 * ew],
        "z": cat[2 * ew :],
    }


def _identity_like(ops, ref):
    one = ops.one_like(ref)
    zero = jnp.zeros_like(ref)
    return {"x": zero, "y": one, "z": zero}


def _stack_add(ops, parts_a, parts_b, b3):
    """One lazy add over a list of equally-shaped point dicts, stacked on
    a new leading batch axis folded into the last axis."""
    cat = lambda ps: {
        k: jnp.concatenate([p[k] for p in ps], axis=-1) for k in ps[0]
    }
    w = parts_a[0]["x"].shape[-1]
    out = fp8q.proj_add_q(ops, cat(parts_a), cat(parts_b), b3)
    return [
        {k: v[..., i * w : (i + 1) * w] for k, v in out.items()}
        for i in range(len(parts_a))
    ]


def weighted_horner(plan: Msm4Plan, F, ctx, partials_cat,
                    as_projective: bool = False):
    """(W*K, 3ew) lazy bucket partials -> final Jacobian point (or, with
    ``as_projective``, the uncanonicalized lazy projective accumulator of
    shape (ew, 1) per coordinate — the cross-device combine form used by
    parallel/sharded.msm4_sharded).

    sum_b b*B_b per window via two high-to-low suffix scans (chunked
    b = hi*GA + g + 1), then the Horner window fold as a masked-parallel
    doubling ladder (all windows advance together; lane w stops after
    c*w doublings) + a log tree over windows."""
    ops = _make_ops(plan, F.tc, ctx.nr_t if ctx else None)
    b3 = _b3_of(plan, ctx)
    W, K, ew, c = plan.W, plan.K, plan.ew, plan.c

    # (W*K, 3ew) -> (3ew, K, W); source order is w-major
    t = partials_cat.reshape(W, K, 3 * ew).transpose(2, 1, 0)
    pts = _split3(t, ew)  # arrays (ew, K, W)

    GA = min(64, K)
    M = K // GA
    chunks = {
        k: v.reshape(ew, M, GA, W) for k, v in pts.items()
    }
    # scan 1 over hi (high -> low): wacc += run; run += B[hi]
    def body1(carry, b_hi):
        run, wacc = carry
        wacc, run = _stack_add(ops, [wacc, run], [run, b_hi], b3)
        return (run, wacc), None

    zero = _identity_like(ops, pts["y"][:, :GA, :])
    rev = {
        k: jnp.flip(v, axis=1).transpose(1, 0, 2, 3)
        for k, v in chunks.items()
    }  # (M, ew, GA, W)
    (col, wacc), _ = jax.lax.scan(body1, (zero, zero), rev)

    # scan 2 over g (high -> low): acc2 += run2; run2 += C_g; wtot += W1_g
    def body2(carry, xs):
        run2, acc2, wtot = carry
        c_g, w1_g = xs
        acc2, run2, wtot = _stack_add(
            ops, [acc2, run2, wtot], [run2, c_g, w1_g], b3
        )
        return (run2, acc2, wtot), None

    zw = _identity_like(ops, pts["y"][:, :1, :])
    rev_g = (
        {k: jnp.flip(v, axis=1).transpose(1, 0, 2)[:, :, None, :]
         for k, v in col.items()},
        {k: jnp.flip(v, axis=1).transpose(1, 0, 2)[:, :, None, :]
         for k, v in wacc.items()},
    )
    (run2, acc2, wtot), _ = jax.lax.scan(body2, (zw, zw, zw), rev_g)

    # total_w = acc2 + run2 + GA * wtot
    ga_bits = GA.bit_length() - 1
    for _ in range(ga_bits):
        wtot = fp8q.proj_dbl_q(ops, wtot, b3)
    part, = _stack_add(ops, [acc2], [run2], b3)
    part, = _stack_add(ops, [part], [wtot], b3)
    # part: (ew, 1, W) -> (ew, W)
    part = {k: v[:, 0, :] for k, v in part.items()}

    # masked-parallel Horner: window w needs c*w doublings
    wids = jnp.arange(W, dtype=jnp.int32)
    total_steps = c * (W - 1)

    def horner_body(t_step, pt):
        d = fp8q.proj_dbl_q(ops, pt, b3)
        keep_dbl = t_step < c * wids  # (W,) lanes
        return {
            k: ops.select(keep_dbl, d[k], pt[k]) for k in pt
        }

    part = jax.lax.fori_loop(0, total_steps, horner_body, part)

    # tree over windows
    cc = W
    acc = part
    while cc > 1:
        h = cc // 2
        p1 = {k: v[..., :h] for k, v in acc.items()}
        p2 = {k: v[..., h : 2 * h] for k, v in acc.items()}
        s = fp8q.proj_add_q(ops, p1, p2, b3)
        if cc % 2:
            tail = {k: v[..., 2 * h : cc] for k, v in acc.items()}
            s = {k: jnp.concatenate([v, tail[k]], axis=-1)
                 for k, v in s.items()}
            cc = h + 1
        else:
            cc = h
        acc = s

    if as_projective:
        return {k: v[..., :1] for k, v in acc.items()}
    return finalize_projective(plan, F, ctx, acc)


def finalize_projective(plan: Msm4Plan, F, ctx, acc):
    """Lazy projective accumulator (ew, 1) -> canonical Jacobian point
    (X*Z, Y*Z^2, Z), the engine's output form."""
    ops = _make_ops(plan, F.tc, ctx.nr_t if ctx else None)
    x = ops.canon(acc["x"][..., :1], 4)
    y = ops.canon(acc["y"][..., :1], 4)
    z = ops.canon(acc["z"][..., :1], 4)
    tcq = F.tc
    if plan.fq2:
        ops2 = ops
        xz = ops2.canon(ops2.mul(x, z), 2)
        z2 = ops2.mul(z, z)
        yz2 = ops2.canon(ops2.mul(y, z2), 2)
        L = F.L
        resh = lambda v: v.reshape(2, L)
        return {"x": resh(xz), "y": resh(yz2), "z": resh(z)}
    xz = fp8t.cond_sub_p_t(fp8q.mont_mul_q(x, z, tcq), tcq)
    z2 = fp8q.mont_mul_q(z, z, tcq)
    yz2 = fp8t.cond_sub_p_t(fp8q.mont_mul_q(y, z2, tcq), tcq)
    return {"x": xz[:, 0], "y": yz2[:, 0], "z": z[:, 0]}


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


def _groups_of(plan: Msm4Plan):
    """Window groups whose bucket matrices stay under the HBM budget:
    the matrix for ALL windows at once is multi-GB for BW6-761 (5.5 GB
    at n=2^18, plus the gather output before the transpose).

    Matrices that fit 1.1 GB whole stay a SINGLE group: every extra group
    dispatch re-runs digits+sort and pays a jit boundary (~260 ms
    measured on the BLS n=2^18 bench plan, whose 1.03 GB matrix just
    missed the old 768 MB budget); the 768 MB chunking only exists to
    bound peak HBM on the multi-GB BW6 plans."""
    total = sum(
        plan.win_lanes(ws) * plan.C * 2 * plan.ew
        for ws in plan.win_shapes
    )
    default = total if total <= (1100 << 20) else (768 << 20)
    budget = int(
        _os_env.get("ZECALE_MSM4_GROUP_BUDGET", str(default))
    )
    groups = []
    glo = 0
    gbytes = 0
    for j in range(plan.W):
        wb = plan.win_lanes(plan.win_shapes[j]) * plan.C * 2 * plan.ew
        if gbytes and gbytes + wb > budget:
            groups.append((glo, j))
            glo, gbytes = j, 0
        gbytes += wb
    groups.append((glo, plan.W))
    return groups


def _prologue(plan: Msm4Plan, scal8, pts_aff):
    nbits = P.CURVES[plan.curve_name].r.bit_length()
    buckets, signs = msm8.signed_digits_from_limbs8(
        scal8, nbits, plan.c
    )
    keys = _build_keys(plan, buckets, signs, pts_aff["inf"])
    skeys = jnp.sort(keys, axis=1)
    starts, counts = _starts_counts(plan, skeys)
    return skeys, starts, counts


def _reduce_fn_of(use_pallas: bool):
    if _os_env.get("ZECALE_MSM4_JNP"):
        use_pallas = False  # debug: bisect kernel vs pipeline on chip
    return bucket_reduce_pallas if use_pallas else bucket_reduce_jnp


def _layer_partials(plan: Msm4Plan, F, ctx, skeys, starts, counts, table,
                    layer, reduce_fn, groups):
    """One capacity layer's (lanes, 3ew) lazy bucket partials."""
    parts = []
    for lo, hi in groups:
        lanes_g = sum(
            plan.win_lanes(ws) for ws in plan.win_shapes[lo:hi]
        )
        pad_g = -(-lanes_g // GL) * GL
        src = _padded_src(
            plan, skeys, starts, counts, layer, (lo, hi)
        )
        if parts:
            # SERIALIZE group computations: groups are data-independent,
            # and when several ~0.8 GB gather outputs coexist the axon
            # backend can corrupt an earlier group's bucket matrix
            # (found by the round-5 batch-8 e2e: every stage is
            # value-correct in isolation).  Tying each group's src to
            # the previous group's partials forces sequential
            # scheduling and lets XLA free the big buffers between
            # groups — also the intended peak-HBM behavior of the
            # chunking.
            src, _ = jax.lax.optimization_barrier((src, parts[-1]))
        mat = (
            table[src]
            .reshape(lanes_g, plan.C, 2 * plan.ew)
            .transpose(1, 2, 0)
        )
        needs = _lane_needs(plan, counts, layer, (lo, hi))
        if pad_g != lanes_g:
            # pad lanes with identity (all-zero) columns
            mat = jnp.pad(
                mat, ((0, 0), (0, 0), (0, pad_g - lanes_g))
            )
            needs = jnp.pad(needs, (0, pad_g - lanes_g))
        block_need = jnp.max(
            needs.reshape(-1, GL), axis=1
        ).astype(jnp.int32)
        parts.append(
            reduce_fn(plan, F, ctx, mat, block_need)[:lanes_g]
        )
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def _flat_runs(plan: Msm4Plan):
    """Contiguous runs of flat windows (reg_wins need not be a prefix
    with calibrated plans — ADVICE r4 high)."""
    reg = list(plan.reg_wins)
    if not reg:
        return []
    runs = []
    lo = prev = reg[0]
    for j in reg[1:]:
        if j != prev + 1:
            runs.append((lo, prev + 1))
            lo = j
        prev = j
    runs.append((lo, prev + 1))
    return runs


def _skew_envs(plan: Msm4Plan):
    """Static per-skew-window (j, K_j, env*C) capacity envelopes."""
    out = []
    for j in plan.skew_wins:
        K_j, classes = plan.win_shapes[j]
        env = np.concatenate(
            [np.full(m, s, dtype=np.int32) for s, m in classes]
        )
        out.append((j, K_j, env * plan.C))
    return out


def layers_needed_host(plan: Msm4Plan, counts_np: np.ndarray,
                       layer: int) -> bool:
    """Host replica of the overflow-layer condition: does `layer` still
    have occupied slots?  Flat windows: any bucket count > layer*C;
    ladder windows: rank r's count > layer*S_r*C."""
    for a, b in _flat_runs(plan):
        if counts_np[a:b].max(initial=0) > layer * plan.C:
            return True
    for j, K_j, cap in _skew_envs(plan):
        srt = -np.sort(-counts_np[j, :K_j])
        if (layer * cap.astype(np.int64) < srt).any():
            return True
    return False


def _fold_assemble(plan: Msm4Plan, F, ctx, partials, counts):
    """Fold each skewed window's sub-lanes to one partial per bucket,
    then assemble the uniform (W*K, 3ew) bucket array (window-major)
    the weighted reduction expects; unused buckets = identity rows."""
    ops = _make_ops(plan, F.tc, ctx.nr_t if ctx else None)
    b3 = _b3_of(plan, ctx)
    ew = plan.ew
    one_m = F.tc["one_mont"].reshape(-1)
    one_coord = (
        jnp.concatenate([one_m, jnp.zeros_like(one_m)])
        if plan.fq2 else one_m
    )
    id_row = jnp.concatenate(
        [jnp.zeros((ew,), jnp.int32), one_coord,
         jnp.zeros((ew,), jnp.int32)]
    )

    def fold_sub(blk, m, S):
        """(m*S, 3ew) rank-major rows -> (m, 3ew) folded partials."""
        if S == 1:
            return blk
        t = blk.reshape(m, S, 3 * ew).transpose(2, 0, 1)
        tpt = _split3(t, ew)
        cc = S
        while cc > 1:
            h = cc // 2
            p1 = {k: v[..., :h] for k, v in tpt.items()}
            p2 = {k: v[..., h : 2 * h] for k, v in tpt.items()}
            sm = fp8q.proj_add_q(ops, p1, p2, b3)
            if cc % 2:
                tail = {k: v[..., 2 * h : cc] for k, v in tpt.items()}
                sm = {k: jnp.concatenate([v, tail[k]], axis=-1)
                      for k, v in sm.items()}
                cc = h + 1
            else:
                cc = h
            tpt = sm
        return jnp.concatenate(
            [tpt["x"][..., 0], tpt["y"][..., 0], tpt["z"][..., 0]],
            axis=0,
        ).T

    rows = []
    off = 0
    for j in range(plan.W):
        K_j, classes = plan.win_shapes[j]
        span = plan.win_lanes(plan.win_shapes[j])
        blk = partials[off : off + span]
        off += span
        if classes == ((1, K_j),):
            bucket_rows = blk
        else:
            # fold each capacity class, concat in rank order, then
            # un-permute back to bucket order
            segs = []
            so = 0
            for S, ra, rb in _class_ranks(classes):
                m = rb - ra
                segs.append(fold_sub(blk[so : so + m * S], m, S))
                so += m * S
            rank_rows = (
                jnp.concatenate(segs, axis=0)
                if len(segs) > 1 else segs[0]
            )
            _, inv = _rank_order(plan, counts, j)
            bucket_rows = rank_rows[inv]
        if K_j < plan.K:
            fill = jnp.broadcast_to(
                id_row, (plan.K - K_j, 3 * ew)
            )
            bucket_rows = jnp.concatenate(
                [bucket_rows, fill], axis=0
            )
        rows.append(bucket_rows)
    return jnp.concatenate(rows, axis=0)


def _combine_partials(plan: Msm4Plan, F, ctx, acc, extra):
    ops = _make_ops(plan, F.tc, ctx.nr_t if ctx else None)
    b3 = _b3_of(plan, ctx)
    a = _split3(acc.T, plan.ew)
    b = _split3(extra.T, plan.ew)
    comb = fp8q.proj_add_q(ops, a, b, b3)
    return jnp.concatenate(
        [comb["x"], comb["y"], comb["z"]], axis=0
    ).T


def _msm4_run(plan: Msm4Plan, F, ctx, scal8, pts_aff, use_pallas: bool,
              as_projective: bool = False):
    """Single-graph pipeline WITH the in-graph lax.while_loop overflow
    layers.  Used by the SHARDED path (host loops cannot live inside
    shard_map) and the CPU tests; the single-chip production entry
    (msm4_jit) instead drives the layers from the HOST, because an
    unexecuted while_loop body corrupts the base partials on the axon
    TPU backend (round-5 finding — see msm4_jit)."""
    skeys, starts, counts = _prologue(plan, scal8, pts_aff)
    table = _table_int8(plan, F, pts_aff)
    reduce_fn = _reduce_fn_of(use_pallas)
    groups = _groups_of(plan)

    partials = _layer_partials(
        plan, F, ctx, skeys, starts, counts, table, jnp.int32(0),
        reduce_fn, groups,
    )

    runs = _flat_runs(plan)
    if runs:
        max_reg = jnp.max(
            jnp.stack([jnp.max(counts[a:b]) for a, b in runs])
        )
    else:
        max_reg = jnp.int32(0)
    # ladder windows: rank r's capacity is S_r*C per layer — compare the
    # descending-sorted counts against the static envelope
    skew_over = []
    for j, K_j, cap in _skew_envs(plan):
        srt = -jnp.sort(-counts[j, :K_j])
        skew_over.append((srt, jnp.asarray(cap)))

    def cond(state):
        layer, _ = state
        fire = layer * plan.C < max_reg
        for srt, cap in skew_over:
            fire = fire | jnp.any(layer * cap < srt)
        return fire

    def body(state):
        layer, acc = state
        extra = _layer_partials(
            plan, F, ctx, skeys, starts, counts, table, layer,
            reduce_fn, groups,
        )
        return layer + 1, _combine_partials(plan, F, ctx, acc, extra)

    if _os_env.get("ZECALE_MSM4_NO_LAYERS"):
        # benchmarking escape hatch: skip the adversarial-overflow layer
        # loop (uniform scalars never take it; see plan capacity margins)
        pass
    else:
        _, partials = jax.lax.while_loop(
            cond, body, (jnp.int32(1), partials)
        )

    partials_full = _fold_assemble(plan, F, ctx, partials, counts)
    return weighted_horner(plan, F, ctx, partials_full,
                           as_projective=as_projective)


@functools.lru_cache(maxsize=None)
def calibrate_slanes_jit(curve_name: str, g2: bool, n: int, c: int = 0):
    """(scal8) -> (W,) per-window max bucket counts, for building a
    calibrated plan (see make_plan's calib).  One digits+sort+counts
    pass — ~2% of an MSM."""
    from ..utils.jit_utils import bound_jit

    plan = make_plan(curve_name, g2, n, c)
    F, _ = _field_ctx(curve_name, plan.fq2)
    nbits = P.CURVES[curve_name].r.bit_length()

    def run(scal8):
        buckets, signs = msm8.signed_digits_from_limbs8(
            scal8, nbits, plan.c
        )
        inf = jnp.zeros((buckets.shape[1],), bool)
        keys = _build_keys(plan, buckets, signs, inf)
        skeys = jnp.sort(keys, axis=1)
        _, counts = _starts_counts(plan, skeys)
        return -jnp.sort(-counts, axis=1)  # descending per window

    return bound_jit([F], run)


def calibrate_slanes(curve_name: str, g2: bool, n: int, scal8,
                     c: int = 0) -> tuple:
    """Per-window rank->sub-lane RLE envelopes for these scalars:
    rank r gets S = next power of two covering its measured count (plus
    drift margin) at capacity C.  Power-of-two quantization keeps the
    envelope stable across witnesses of the same circuit — the wire
    STRUCTURE (which wires are bits), not the values, drives the
    distribution."""
    plan = make_plan(curve_name, g2, n, c)
    srt = np.asarray(calibrate_slanes_jit(curve_name, g2, n, c)(scal8))
    out = []
    for jw in range(plan.W):
        K_j = plan.win_shapes[jw][0]
        rle = []
        for r in range(K_j):
            cnt = int(srt[jw, r])
            need = cnt + 6 * int(math.isqrt(cnt + 1)) + 8
            S = _next_pow2(max(1, -(-need // plan.C)))
            if rle and rle[-1][0] == S:
                rle[-1][1] += 1
            elif rle and rle[-1][0] < S:
                # keep the envelope monotone non-increasing over ranks
                rle[-1][1] += 1
            else:
                rle.append([S, 1])
        out.append(tuple((s, m) for s, m in rle))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def msm4_jit(curve_name: str, g2: bool, n: int, c: int = 0,
             use_pallas: bool | None = None, calib: tuple = ()):
    """(scal8 std-form (n, Lr) 8-bit limbs, pts_aff) -> Jacobian point.

    Same call surface as msm8.msm8_jit but the point count is a static
    plan parameter (capacity/padding shapes depend on it).

    HOST-ORCHESTRATED layers (round 5): the base-layer partials + bucket
    counts run in one jit; the adversarial overflow-layer decision runs
    on the HOST from the (W, K) counts (layers_needed_host — the exact
    cond the sharded path's lax.while_loop evaluates in-graph), with
    extra layers dispatched as separate lazily-compiled jits; a second
    jit does the sub-lane fold + weighted Horner.  Rationale: on the
    axon TPU backend an in-graph while_loop whose body embeds the
    4-group gather/reduce graphs CORRUPTS the base partials even when
    the loop body never executes (round-5 batch-8 e2e produced an
    invalid proof; every stage value-checked correct in isolation).
    The split also drops the unexecuted layer graphs from the compile
    and lets the common no-overflow path stay small."""
    from ..utils.jit_utils import bound_jit

    plan = make_plan(curve_name, g2, n, c, calib)
    F, ctx = _field_ctx(curve_name, plan.fq2)
    if use_pallas is None:
        use_pallas = True
    binders = [F] + ([ctx] if ctx else [])
    groups = _groups_of(plan)
    reduce_fn = _reduce_fn_of(use_pallas)

    def group_run(scal8, pts_aff, layer, win_range):
        skeys, starts, counts = _prologue(plan, scal8, pts_aff)
        table = _table_int8(plan, F, pts_aff)
        parts = _layer_partials(
            plan, F, ctx, skeys, starts, counts, table, layer,
            reduce_fn, [win_range],
        )
        # counts ride along so the overflow-layer decision and the
        # epilogue need no separate prologue pass
        return parts, counts

    def epilogue(counts, *parts):
        partials = (
            jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        )
        pf = _fold_assemble(plan, F, ctx, partials, counts)
        return weighted_horner(plan, F, ctx, pf)

    grp_j = {
        wr: bound_jit(
            binders,
            functools.partial(
                lambda s, p, l, wr=None: group_run(s, p, l, wr), wr=wr
            ),
        )
        for wr in groups
    }
    epi_j = bound_jit(binders, epilogue)
    lazy = {}

    def call(scal8, pts_aff):
        # one DISPATCH per window group: each group's gather+reduce runs
        # as the isolated graph that is stable on the backend; a fused
        # multi-group graph intermittently corrupts one group's bucket
        # matrix (which group varies with graph structure — round-5
        # batch-8 e2e invalid-proof debugging).  The jit-boundary cost
        # (re-running digits+sort per group) is bounded by keeping
        # fits-whole matrices single-group (_groups_of) and riding the
        # bucket counts on the first group's output instead of a
        # separate prologue jit; per-group dispatch also bounds live HBM
        # to one group's matrix.
        outs = [
            grp_j[wr](scal8, pts_aff, jnp.int32(0)) for wr in groups
        ]
        parts = [o[0] for o in outs]
        counts = outs[0][1]
        counts_np = np.asarray(counts)  # (W, K) i32 — tiny host pull
        layer = 1
        while layers_needed_host(plan, counts_np, layer):
            for gi, wr in enumerate(groups):
                key = ("comb", parts[gi].shape[0])
                if key not in lazy:
                    lazy[key] = bound_jit(
                        binders,
                        lambda a, b: _combine_partials(
                            plan, F, ctx, a, b
                        ),
                    )
                extra, _ = grp_j[wr](scal8, pts_aff, jnp.int32(layer))
                parts[gi] = lazy[key](parts[gi], extra)
            layer += 1
        return epi_j(counts, *parts)

    return call


def msm4(curve_name: str, scalars, points, g2: bool = False, c: int = 0,
         use_pallas: bool | None = None):
    """Host-convenience MSM (scalars/points in, affine host point out)."""
    r = P.CURVES[curve_name].r
    n = len(points)
    Fr = fp8.field8(r)
    scal8 = Fr.pack([s % r for s in scalars], mont=False)
    pts = msm8.pack_points_affine8(curve_name, points, g2=g2)
    acc = msm4_jit(curve_name, g2, n, c, use_pallas)(scal8, pts)
    return msm8.unpack_jac_point8(curve_name, acc, g2=g2)
