"""Fused elliptic-curve group-law kernels (Pallas, TPU).

Each kernel computes a FULL unified group operation (all field muls, adds
and carry networks) inside VMEM on a block of points, so HBM sees only the
point coordinates — the round-1 design materialized every intermediate
(B, L^2) convolution operand through HBM, which capped the whole MSM at
~250 GB/s of pure traffic.

Layout strategy: points arrive batch-major (B, EW) (gather/sort friendly;
EW = limbs, 2x limbs for Fq2 coordinates); the kernel transposes each block
to limb-major (EW, Bt) so the batch axis fills all 128 VPU lanes (a (B, 48)
layout wastes 62% of them).

The group-law bodies are generic over a field-ops object: _BaseOps (Fq,
fp8t helpers) and _Fq2Ops (Karatsuba over coordinate halves) — the same
formulas serve G1 of BLS12-377/BW6-761, BW6-761 G2 (coords in Fq) and
BLS12-377 G2 (coords in Fq2).

Formulas mirror ec/curve_jax.py (dbl-2009-l, add-2007-bl, mmadd/
mdbl-2007-bl) including the unified special-case handling, so the kernels
are drop-in replacements validated differentially against JacCurve.

On non-TPU backends the same kernels run under the Pallas interpreter
(tests) — identical semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ff import fp8, fp8t
from ..ff import params as P
from .curve_jax import ProjCurve

DEFAULT_BT = 256

#: Mosaic allocates kernel temporaries on a 16 MB VMEM stack without full
#: liveness reuse; the fused group-law kernels need per-kernel block caps
#: (measured: the affine-affine kernel OOMs scoped vmem at bt=256 for
#: L=48, and at bt=32 for L=96 — caps scale ~quadratically with limbs).
_BT_CAP48 = {"jac_add": 128, "jac_dbl": 256, "aff_add": 64}


def _bt_cap(op: str, width_units: int) -> int:
    """width_units: total element width relative to L=48 (1 = BLS Fq,
    2 = BW6 Fq or BLS Fq2)."""
    if width_units <= 1:
        return _BT_CAP48[op]
    return max(16, _BT_CAP48[op] // (width_units * width_units))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# field-ops objects used inside kernel bodies (transposed (EW, B) arrays)
# ---------------------------------------------------------------------------


class _BaseOps:
    """Fq ops on (L, B) transposed limb planes."""

    def __init__(self, tc):
        self.tc = tc

    def mul(self, a, b):
        return fp8t.mont_mul_t(a, b, self.tc)

    def sqr(self, a):
        return fp8t.mont_mul_t(a, a, self.tc)

    def add(self, a, b):
        return fp8t.add_t(a, b, self.tc)

    def sub(self, a, b):
        return fp8t.sub_t(a, b, self.tc)

    def dbl(self, a):
        return fp8t.double_t(a, self.tc)

    def neg(self, a):
        return fp8t.neg_t(a, self.tc)

    def is_zero(self, a):
        return fp8t.is_zero_t(a)

    def select(self, cond, t, f):
        return fp8t.select_t(cond, t, f)

    def one_like(self, a):
        return jnp.broadcast_to(self.tc["one_mont"], a.shape)


class _Fq2Ops:
    """Fq2 ops on (2L, B) stacked coordinate planes (c0 rows then c1)."""

    def __init__(self, tc, nr_t):
        self.tc = tc
        self.nr_t = nr_t  # (L, 1) Montgomery non-residue
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
        return self._per(lambda x, y: fp8t.add_t(x, y, self.tc), a, b)

    def sub(self, a, b):
        return self._per(lambda x, y: fp8t.sub_t(x, y, self.tc), a, b)

    def dbl(self, a):
        return self._per(lambda x: fp8t.double_t(x, self.tc), a)

    def neg(self, a):
        return self._per(lambda x: fp8t.neg_t(x, self.tc), a)

    def mul(self, a, b):
        tc = self.tc
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        t0 = fp8t.mont_mul_t(a0, b0, tc)
        t1 = fp8t.mont_mul_t(a1, b1, tc)
        sa = fp8t.add_t(a0, a1, tc)
        sb = fp8t.add_t(b0, b1, tc)
        mid = fp8t.sub_t(
            fp8t.sub_t(fp8t.mont_mul_t(sa, sb, tc), t0, tc), t1, tc
        )
        nr = jnp.broadcast_to(self.nr_t, t1.shape)
        c0 = fp8t.add_t(t0, fp8t.mont_mul_t(t1, nr, tc), tc)
        return self._cat(c0, mid)

    def sqr(self, a):
        return self.mul(a, a)

    def is_zero(self, a):
        return fp8t.is_zero_t(a)  # all 2L rows zero

    def select(self, cond, t, f):
        return jnp.where(cond[None], t, f)

    def one_like(self, a):
        one = jnp.broadcast_to(self.tc["one_mont"], (self.L, a.shape[1]))
        return jnp.concatenate([one, jnp.zeros_like(one)], axis=0)


# ---------------------------------------------------------------------------
# kernel bodies (generic over the ops object)
# ---------------------------------------------------------------------------


def _jac_add_t(F, X1, Y1, Z1, X2, Y2, Z2):
    """Unified Jacobian P+Q; returns (X3, Y3, Z3).  a=0 curves."""
    S, A, D = F.sub, F.add, F.dbl
    Z1Z1 = F.sqr(Z1)
    Z2Z2 = F.sqr(Z2)
    Ad = F.sqr(X1)
    Bd = F.sqr(Y1)
    ZZs = F.sqr(A(Z1, Z2))
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    t1 = F.mul(Z2, Z2Z2)
    t2 = F.mul(Z1, Z1Z1)
    Cd = F.sqr(Bd)
    XB2 = F.sqr(A(X1, Bd))
    H = S(U2, U1)
    Ed = A(D(Ad), Ad)  # 3A
    S1 = F.mul(Y1, t1)
    S2 = F.mul(Y2, t2)
    I = F.sqr(D(H))
    Fd = F.sqr(Ed)
    YZ = F.mul(Y1, Z1)
    Rr = S(S2, S1)
    r2 = D(Rr)
    Dd = D(S(S(XB2, Ad), Cd))
    Xd = S(Fd, D(Dd))
    ZZc = S(S(ZZs, Z1Z1), Z2Z2)
    J = F.mul(H, I)
    V = F.mul(U1, I)
    R2S = F.sqr(r2)
    EDX = F.mul(Ed, S(Dd, Xd))
    Z3 = F.mul(ZZc, H)
    X3 = S(S(R2S, J), D(V))
    eightC = D(D(D(Cd)))
    Yd = S(EDX, eightC)
    Zd = D(YZ)
    T1 = F.mul(r2, S(V, X3))
    T2 = F.mul(S1, J)
    Y3 = S(T1, D(T2))

    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    h_zero = F.is_zero(H)
    r_zero = F.is_zero(Rr)
    dbl_case = h_zero & r_zero & ~p_inf & ~q_inf
    inv_case = h_zero & ~r_zero & ~p_inf & ~q_inf

    sel = F.select
    ox = sel(dbl_case, Xd, X3)
    oy = sel(dbl_case, Yd, Y3)
    oz = sel(dbl_case, Zd, Z3)
    oz = sel(inv_case, jnp.zeros_like(oz), oz)
    ox = sel(p_inf, X2, ox)
    oy = sel(p_inf, Y2, oy)
    oz = sel(p_inf, Z2, oz)
    keep_p = q_inf & ~p_inf
    ox = sel(keep_p, X1, ox)
    oy = sel(keep_p, Y1, oy)
    oz = sel(keep_p, Z1, oz)
    return ox, oy, oz


def _jac_dbl_t(F, X1, Y1, Z1):
    S, A, D = F.sub, F.add, F.dbl
    Ad = F.sqr(X1)
    Bd = F.sqr(Y1)
    YZ = F.mul(Y1, Z1)
    X1pB = A(X1, Bd)
    Ed = A(D(Ad), Ad)
    Cd = F.sqr(Bd)
    XB2 = F.sqr(X1pB)
    Fd = F.sqr(Ed)
    Dd = D(S(S(XB2, Ad), Cd))
    X3 = S(Fd, D(Dd))
    EDX = F.mul(Ed, S(Dd, X3))
    Y3 = S(EDX, D(D(D(Cd))))
    Z3 = D(YZ)
    return X3, Y3, Z3


def _aff_aff_add_t(F, X1, Y1, inf1, X2, Y2, inf2):
    """Affine + affine -> Jacobian (mmadd-2007-bl + mdbl-2007-bl)."""
    S, A, D = F.sub, F.add, F.dbl
    one = F.one_like(X1)

    H = S(X2, X1)
    ry = S(Y2, Y1)
    HH = F.sqr(H)
    XX = F.sqr(X1)
    YY = F.sqr(Y1)
    I = D(D(HH))
    r = D(ry)
    M = A(D(XX), XX)
    X1pYY = A(X1, YY)
    J = F.mul(H, I)
    V = F.mul(X1, I)
    rr = F.sqr(r)
    YYYY = F.sqr(YY)
    T = F.sqr(X1pYY)
    MM = F.sqr(M)
    X3 = S(S(rr, J), D(V))
    Sd = D(S(S(T, XX), YYYY))
    Xd = S(MM, D(Sd))
    T1 = F.mul(r, S(V, X3))
    T2 = F.mul(Y1, J)
    T3 = F.mul(M, S(Sd, Xd))
    Y3 = S(T1, D(T2))
    Z3 = D(H)
    Yd = S(T3, D(D(D(YYYY))))
    Zd = D(Y1)

    h_zero = F.is_zero(H)
    r_zero = F.is_zero(ry)
    dbl_case = h_zero & r_zero & ~inf1 & ~inf2
    inv_case = h_zero & ~r_zero & ~inf1 & ~inf2

    sel = F.select
    z1 = sel(inf1, jnp.zeros_like(one), one)
    z2 = sel(inf2, jnp.zeros_like(one), one)
    ox = sel(dbl_case, Xd, X3)
    oy = sel(dbl_case, Yd, Y3)
    oz = sel(dbl_case, Zd, Z3)
    oz = sel(inv_case, jnp.zeros_like(oz), oz)
    ox = sel(inf1, X2, ox)
    oy = sel(inf1, Y2, oy)
    oz = sel(inf1, z2, oz)
    keep_p = inf2 & ~inf1
    ox = sel(keep_p, X1, ox)
    oy = sel(keep_p, Y1, oy)
    oz = sel(keep_p, z1, oz)
    return ox, oy, oz


def _proj_add_t(F, X1, Y1, Z1, X2, Y2, Z2, mul_b3):
    """COMPLETE projective P+Q (RCB16 algorithm 7, a=0): 12M + 2*b3, no
    selects, no exceptional cases.  Mirrors curve_jax.ProjCurve.add."""
    S, A, D = F.sub, F.add, F.dbl
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t2 = F.mul(Z1, Z2)
    t3 = S(F.mul(A(X1, Y1), A(X2, Y2)), A(t0, t1))
    t4 = S(F.mul(A(Y1, Z1), A(Y2, Z2)), A(t1, t2))
    y3 = S(F.mul(A(X1, Z1), A(X2, Z2)), A(t0, t2))
    t0 = A(D(t0), t0)  # 3*t0
    t2 = mul_b3(t2)
    z3 = A(t1, t2)
    t1 = S(t1, t2)
    y3 = mul_b3(y3)
    x3 = S(F.mul(t3, t1), F.mul(t4, y3))
    y3 = A(F.mul(y3, t0), F.mul(t1, z3))
    z3 = A(F.mul(z3, t4), F.mul(t0, t3))
    return x3, y3, z3


def _proj_dbl_t(F, X, Y, Z, mul_b3):
    """COMPLETE projective doubling (RCB16 algorithm 9, a=0): 6M+2S+b3."""
    S, A, D = F.sub, F.add, F.dbl
    t0 = F.sqr(Y)
    z3 = D(D(D(t0)))
    t1 = F.mul(Y, Z)
    t2 = mul_b3(F.sqr(Z))
    x3 = F.mul(t2, z3)
    y3 = A(t0, t2)
    z3 = F.mul(t1, z3)
    t1 = D(t2)
    t2 = A(t1, t2)
    t0 = S(t0, t2)
    y3 = A(x3, F.mul(t0, y3))
    x3 = D(F.mul(t0, F.mul(X, Y)))
    return x3, y3, z3


# ---------------------------------------------------------------------------
# pallas plumbing
# ---------------------------------------------------------------------------


def _tc_static(F):
    return {"L": F.L, "h": F.L // 2 if F.karatsuba else F.L,
            "karatsuba": F.karatsuba}


def _pad_to(x, B):
    b = x.shape[0]
    if b == B:
        return x
    pad = [(0, B - b)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _mask_to_i32(m):
    return m.astype(jnp.int32)[:, None]


class _KernelFamily:
    """Builds the three group-law kernels for one coordinate field."""

    def __init__(self, curve_name: str, g2: bool, bt: int,
                 is_g2: bool = False):
        cp = P.CURVES[curve_name]
        self.Fq = fp8.field8(cp.q)
        self.g2_ext = bool(g2 and cp.g2_degree == 2)
        is_g2 = is_g2 or g2
        L = self.Fq.L
        self.ew = 2 * L if self.g2_ext in (True,) else L
        units = self.ew // 48 + (1 if self.ew % 48 else 0)
        self.bt = {
            op: min(bt, _bt_cap(op, max(1, units)))
            for op in _BT_CAP48
        }
        if self.g2_ext:
            assert curve_name == "bls12-377"
            R = 1 << (8 * L)
            nr = P.BLS12_377_FQ2_QNR
            self.nr_t = jnp.asarray(
                fp8.to_limbs8(nr * R % cp.q, L).reshape(L, 1)
            )
        else:
            self.nr_t = None
        # b3 = 3*b of the group's curve equation, for the RCB complete
        # projective law.  Small-integer b3 (all Fq-coordinate groups of
        # the BLS12-377/BW6-761 family) is applied with carry-level ops
        # only; the BLS12-377 G2 twist constant rides as a kernel const.
        q = cp.q
        if self.g2_ext:
            # D-twist: y^2 = x^3 + b/u with b=1, u^2 = -5 -> b2 = (0, -1/5)
            R = 1 << (8 * L)
            c1 = (-3 * pow(5, q - 2, q)) % q
            self.b3_small = None
            self.b3_t = jnp.asarray(
                np.concatenate(
                    [fp8.to_limbs8(0, L), fp8.to_limbs8(c1 * R % q, L)]
                ).reshape(2 * L, 1)
            )
        else:
            b = 4 if (is_g2 and cp.g2_degree == 1) else cp.b
            self.b3_small = {1: 3, q - 1: -3, 4: 12}[b]
            self.b3_t = None

    def _ops(self, consts):
        tc = _tc_static(self.Fq)
        nc = len(fp8t.TC_ARRAYS)
        for name, ref in zip(fp8t.TC_ARRAYS, consts[:nc]):
            tc[name] = ref[:]
        if self.g2_ext:
            return _Fq2Ops(tc, consts[nc][:])
        return _BaseOps(tc)

    def _consts(self):
        arr = [self.Fq.tc[n] for n in fp8t.TC_ARRAYS]
        if self.g2_ext:
            arr.append(self.nr_t)
        if self.b3_t is not None:
            arr.append(self.b3_t)
        return arr

    def _mul_b3_fn(self, F, consts):
        """b3-multiplication closure for the RCB kernel bodies."""
        if self.b3_small is not None:
            s = self.b3_small

            def mul_small_t(t):
                out = F.add(F.dbl(t), t)  # 3t
                if abs(s) == 12:
                    out = F.dbl(F.dbl(out))
                return F.neg(out) if s < 0 else out

            return mul_small_t
        b3 = consts[-1][:]

        def mul_const(t):
            return F.mul(t, jnp.broadcast_to(b3, t.shape))

        return mul_const

    def _call(self, kernel, ins, n_out, bt):
        B = ins[0].shape[0]
        Bp = -(-B // bt) * bt
        ins = [_pad_to(v, Bp) for v in ins]
        specs = []
        for v in ins:
            w = v.shape[1]
            specs.append(
                pl.BlockSpec((bt, w), (lambda i: (i, 0)),
                             memory_space=pltpu.VMEM)
            )
        consts = self._consts()
        cspecs = [
            pl.BlockSpec(c.shape, (lambda i, nd=c.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for c in consts
        ]
        pt_out = pl.BlockSpec((bt, self.ew), (lambda i: (i, 0)),
                              memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(Bp // bt,),
            in_specs=specs + cspecs,
            out_specs=[pt_out] * n_out,
            out_shape=[jax.ShapeDtypeStruct((Bp, self.ew), jnp.int32)]
            * n_out,
            interpret=_interpret(),
        )(*ins, *consts)
        return [o[:B] for o in out]

    # -- jac add ---------------------------------------------------------
    def jac_add(self, p, q):
        fam = self

        def kernel(*refs):
            ins = refs[:6]
            consts = refs[6:-3]
            outs = refs[-3:]
            F = fam._ops(consts)
            vals = [r[:].T for r in ins]
            ox, oy, oz = _jac_add_t(F, *vals)
            outs[0][:] = ox.T
            outs[1][:] = oy.T
            outs[2][:] = oz.T

        o = self._call(
            kernel,
            [p["x"], p["y"], p["z"], q["x"], q["y"], q["z"]],
            3,
            self.bt["jac_add"],
        )
        return {"x": o[0], "y": o[1], "z": o[2]}

    def jac_dbl(self, p):
        fam = self

        def kernel(*refs):
            ins = refs[:3]
            consts = refs[3:-3]
            outs = refs[-3:]
            F = fam._ops(consts)
            vals = [r[:].T for r in ins]
            ox, oy, oz = _jac_dbl_t(F, *vals)
            outs[0][:] = ox.T
            outs[1][:] = oy.T
            outs[2][:] = oz.T

        o = self._call(
            kernel, [p["x"], p["y"], p["z"]], 3, self.bt["jac_dbl"]
        )
        return {"x": o[0], "y": o[1], "z": o[2]}

    def jac_dbl_chain(self, p, k: int):
        """2^k * P with the whole doubling chain fused into ONE kernel
        (fori_loop inside the body) — the Horner window fold and the
        G-scaling of the weighted bucket reduction were previously k
        separate width-1/width-W launches each (~1 ms of launch latency
        apiece on the v5e)."""
        fam = self

        def kernel(*refs):
            ins = refs[:3]
            consts = refs[3:-3]
            outs = refs[-3:]
            F = fam._ops(consts)

            def body(_, s):
                return _jac_dbl_t(F, *s)

            ox, oy, oz = jax.lax.fori_loop(
                0, k, body, tuple(r[:].T for r in ins)
            )
            outs[0][:] = ox.T
            outs[1][:] = oy.T
            outs[2][:] = oz.T

        o = self._call(
            kernel, [p["x"], p["y"], p["z"]], 3, self.bt["jac_dbl"]
        )
        return {"x": o[0], "y": o[1], "z": o[2]}

    def aff_add(self, a1, a2):
        fam = self

        def kernel(*refs):
            x1, y1, i1, x2, y2, i2 = refs[:6]
            consts = refs[6:-3]
            outs = refs[-3:]
            F = fam._ops(consts)
            inf1 = i1[:][:, 0] > 0
            inf2 = i2[:][:, 0] > 0
            ox, oy, oz = _aff_aff_add_t(
                F, x1[:].T, y1[:].T, inf1, x2[:].T, y2[:].T, inf2
            )
            outs[0][:] = ox.T
            outs[1][:] = oy.T
            outs[2][:] = oz.T

        o = self._call(
            kernel,
            [
                a1["x"], a1["y"], _mask_to_i32(a1["inf"]),
                a2["x"], a2["y"], _mask_to_i32(a2["inf"]),
            ],
            3,
            self.bt["aff_add"],
        )
        return {"x": o[0], "y": o[1], "z": o[2]}


    # -- complete projective (RCB) kernels --------------------------------
    def proj_add(self, p, q):
        fam = self

        def kernel(*refs):
            ins = refs[:6]
            consts = refs[6:-3]
            outs = refs[-3:]
            F = fam._ops(consts)
            mb3 = fam._mul_b3_fn(F, consts)
            vals = [r[:].T for r in ins]
            ox, oy, oz = _proj_add_t(F, *vals, mb3)
            outs[0][:] = ox.T
            outs[1][:] = oy.T
            outs[2][:] = oz.T

        o = self._call(
            kernel,
            [p["x"], p["y"], p["z"], q["x"], q["y"], q["z"]],
            3,
            self.bt["jac_add"],
        )
        return {"x": o[0], "y": o[1], "z": o[2]}

    def proj_dbl_chain(self, p, k: int):
        fam = self

        def kernel(*refs):
            ins = refs[:3]
            consts = refs[3:-3]
            outs = refs[-3:]
            F = fam._ops(consts)
            mb3 = fam._mul_b3_fn(F, consts)

            def body(_, s):
                return _proj_dbl_t(F, *s, mb3)

            ox, oy, oz = jax.lax.fori_loop(
                0, k, body, tuple(r[:].T for r in ins)
            )
            outs[0][:] = ox.T
            outs[1][:] = oy.T
            outs[2][:] = oz.T

        o = self._call(
            kernel, [p["x"], p["y"], p["z"]], 3, self.bt["jac_dbl"]
        )
        return {"x": o[0], "y": o[1], "z": o[2]}


@functools.lru_cache(maxsize=None)
def _family(curve_name: str, g2: bool, bt: int,
            is_g2: bool = False) -> _KernelFamily:
    """``g2``: coordinates live in Fq2 (kernel family selector).
    ``is_g2``: the GROUP is G2 (b3 selector — BW6-761 G2 shares the Fq
    kernel family with G1 but has a different curve constant)."""
    return _KernelFamily(curve_name, g2, bt, is_g2=is_g2)


# ---------------------------------------------------------------------------
# public API: JacCurve-compatible ops objects backed by the kernels
# ---------------------------------------------------------------------------


def _flatten_pt(pt, ew):
    """Flatten leading dims to one batch axis; Fq2 coords (..., 2, L) are
    viewed as (..., 2L)."""
    lead = None
    flat = {}
    for k, v in pt.items():
        if k == "inf":
            flat[k] = v.reshape(-1)
            if lead is None:
                lead = v.shape
        else:
            flat[k] = v.reshape(-1, ew)
            if lead is None:
                nd = 2 if v.shape[-1] != ew else 1
                lead = v.shape[: v.ndim - nd]
    return flat, lead


class PallasG1Curve:
    """Drop-in subset of JacCurve backed by fused Pallas kernels.  Despite
    the name it serves any group whose unified a=0 formulas apply: G1 of
    BLS12-377/BW6-761, BW6-761 G2 (Fq coords) and BLS12-377 G2 (Fq2
    coords, ``g2=True``)."""

    def __init__(self, curve_name: str, bt: int = DEFAULT_BT,
                 g2: bool = False):
        self.curve_name = curve_name
        cp = P.CURVES[curve_name]
        self.g2_ext = bool(g2 and cp.g2_degree == 2)
        if self.g2_ext:
            from .msm8 import Fp28TPU

            self.F = Fp28TPU(cp.q, P.BLS12_377_FQ2_QNR)
        else:
            self.F = fp8.field8(cp.q)
        self.fam = _family(curve_name, self.g2_ext, bt, is_g2=g2)
        self.ew = self.fam.ew
        self._coord_shape = (
            (2, self.F.L) if self.g2_ext else (self.F.L,)
        )

    def _unflatten(self, out, lead):
        return {
            k: v.reshape(*lead, *self._coord_shape) for k, v in out.items()
        }

    # -- kernel-backed ops ------------------------------------------------
    def add(self, p, q):
        fp_, lead = _flatten_pt(p, self.ew)
        fq_, _ = _flatten_pt(q, self.ew)
        return self._unflatten(self.fam.jac_add(fp_, fq_), lead)

    def dbl(self, p):
        fp_, lead = _flatten_pt(p, self.ew)
        return self._unflatten(self.fam.jac_dbl(fp_), lead)

    def dbl_chain(self, p, k: int):
        if k == 0:
            return p
        fp_, lead = _flatten_pt(p, self.ew)
        return self._unflatten(self.fam.jac_dbl_chain(fp_, k), lead)

    def add_affine_affine(self, a1, a2, z_one=None):
        f1, lead = _flatten_pt(a1, self.ew)
        f2, _ = _flatten_pt(a2, self.ew)
        return self._unflatten(self.fam.aff_add(f1, f2), lead)

    # -- glue (identical to JacCurve) --------------------------------------
    def infinity_like(self, pt):
        zero = jnp.zeros_like(pt["x"])
        return {"x": zero, "y": zero, "z": jnp.zeros_like(pt["z"])}

    def is_infinity(self, pt):
        return self.F.is_zero(pt["z"])

    def mask(self, pt, keep):
        return {
            "x": pt["x"],
            "y": pt["y"],
            "z": self.F.select(keep, pt["z"], jnp.zeros_like(pt["z"])),
        }

    def select(self, cond, if_true, if_false):
        F = self.F
        return {
            k: F.select(cond, if_true[k], if_false[k])
            for k in ("x", "y", "z")
        }

    def tree_reduce(self, pts):
        n = pts["x"].shape[0]
        while n > 1:
            half = n // 2
            even = {k: v[: 2 * half : 2] for k, v in pts.items()}
            odd = {k: v[1 : 2 * half : 2] for k, v in pts.items()}
            summed = self.add(even, odd)
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


class PallasProjCurve(ProjCurve):
    """ProjCurve (complete RCB group law) with add / dbl / dbl_chain backed
    by the fused Pallas kernels; the cheap element-wise glue (mask, select,
    from_affine, identity) stays on the inherited jnp path.

    Serves the same groups as PallasG1Curve: G1 of BLS12-377/BW6-761,
    BW6-761 G2 (Fq coords) and BLS12-377 G2 (Fq2 coords, ``g2=True``)."""

    def __init__(self, curve_name: str, bt: int = DEFAULT_BT,
                 g2: bool = False):
        cp = P.CURVES[curve_name]
        self.curve_name = curve_name
        self.g2_ext = bool(g2 and cp.g2_degree == 2)
        if self.g2_ext:
            from .msm8 import Fp28TPU

            F = Fp28TPU(cp.q, P.BLS12_377_FQ2_QNR)
            c1 = (-3 * pow(5, cp.q - 2, cp.q)) % cp.q
            b3 = F.pack([(0, c1)])[0]  # (2, L) Montgomery
        else:
            F = fp8.field8(cp.q)
            b = 4 if (g2 and cp.g2_degree == 1) else cp.b
            b3 = {1: 3, cp.q - 1: -3, 4: 12}[b]
        super().__init__(F, b3)
        self.fam = _family(curve_name, self.g2_ext, bt, is_g2=g2)
        self.ew = self.fam.ew
        self._coord_shape = (
            (2, F.L) if self.g2_ext else (F.L,)
        )

    def _unflatten(self, out, lead):
        return {
            k: v.reshape(*lead, *self._coord_shape) for k, v in out.items()
        }

    def add(self, p, q):
        fp_, lead = _flatten_pt(p, self.ew)
        fq_, _ = _flatten_pt(q, self.ew)
        return self._unflatten(self.fam.proj_add(fp_, fq_), lead)

    def dbl(self, p):
        return self.dbl_chain(p, 1)

    def dbl_chain(self, p, k: int):
        if k == 0:
            return p
        fp_, lead = _flatten_pt(p, self.ew)
        return self._unflatten(self.fam.proj_dbl_chain(fp_, k), lead)
