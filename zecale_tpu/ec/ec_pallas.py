"""Fused elliptic-curve group-law kernels (Pallas, TPU).

Each kernel computes a FULL unified group operation (all field muls, adds
and carry networks) inside VMEM on a block of points, so HBM sees only the
point coordinates — the round-1 design materialized every intermediate
(B, L^2) convolution operand through HBM, which capped the whole MSM at
~250 GB/s of pure traffic.

Layout strategy: points arrive batch-major (B, L) (gather/sort friendly);
the kernel transposes each block to limb-major (L, Bt) so the batch axis
fills all 128 VPU lanes (a (B, 48) layout wastes 62% of them), and batches
every independent field multiplication of a formula round into ONE
convolution call (concatenated along lanes) to feed the MXU wide matmuls.

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

DEFAULT_BT = 256

#: Mosaic allocates kernel temporaries on a 16 MB VMEM stack without full
#: liveness reuse; the fused group-law kernels need per-kernel block caps
#: (measured: the affine-affine kernel OOMs scoped vmem at bt=256 for
#: L=48).  Caps scale inversely with the limb count.
_BT_CAP48 = {"jac_add": 256, "jac_dbl": 256, "aff_add": 64}


def _bt_cap(op: str, L: int) -> int:
    return max(32, _BT_CAP48[op] * 48 // L)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _muls(tc, *pairs):
    """Independent field muls of one formula round.

    (A lane-concat batching of these into one wide convolution trips a
    Mosaic NotImplemented — tpu.concatenate with mismatched sublane
    offsets — so they are issued per pair; each mul already fills two
    full lane tiles at the default block size.)"""
    return [fp8t.mont_mul_t(a, b, tc) for a, b in pairs]


# ---------------------------------------------------------------------------
# kernel bodies (transposed, batched-mul formula schedules)
# ---------------------------------------------------------------------------


def _jac_add_t(tc, X1, Y1, Z1, X2, Y2, Z2):
    """Unified Jacobian P+Q on (L, B) coords; returns (X3, Y3, Z3)."""
    S = lambda a, b: fp8t.sub_t(a, b, tc)
    A = lambda a, b: fp8t.add_t(a, b, tc)
    D = lambda a: fp8t.double_t(a, tc)

    # round 1: [Z1^2, Z2^2, A=X1^2, B=Y1^2, ZZsum=(Z1+Z2)^2]
    Z1pZ2 = A(Z1, Z2)
    Z1Z1, Z2Z2, Ad, Bd, ZZs = _muls(
        tc, (Z1, Z1), (Z2, Z2), (X1, X1), (Y1, Y1), (Z1pZ2, Z1pZ2)
    )
    # round 2: [U1, U2, t1=Z2*Z2Z2, t2=Z1*Z1Z1, C=B^2, (X1+B)^2]
    X1pB = A(X1, Bd)
    U1, U2, t1, t2, Cd, XB2 = _muls(
        tc, (X1, Z2Z2), (X2, Z1Z1), (Z2, Z2Z2), (Z1, Z1Z1), (Bd, Bd),
        (X1pB, X1pB)
    )
    H = S(U2, U1)
    Ed = A(D(Ad), Ad)  # 3A
    # round 3: [S1, S2, I=(2H)^2, F=E^2, YZ=Y1*Z1]
    H2 = D(H)
    S1, S2, I, Fd, YZ = _muls(
        tc, (Y1, t1), (Y2, t2), (H2, H2), (Ed, Ed), (Y1, Z1)
    )
    Rr = S(S2, S1)
    r2 = D(Rr)
    Dd = D(S(S(XB2, Ad), Cd))  # 2((X1+B)^2 - A - C)
    Xd = S(Fd, D(Dd))
    # round 4: [J=H*I, V=U1*I, r2^2, E*(D-Xd), Z3core=(ZZs-Z1Z1-Z2Z2)*H]
    ZZc = S(S(ZZs, Z1Z1), Z2Z2)
    J, V, R2S, EDX, Z3 = _muls(
        tc, (H, I), (U1, I), (r2, r2), (Ed, S(Dd, Xd)), (ZZc, H)
    )
    X3 = S(S(R2S, J), D(V))
    eightC = D(D(D(Cd)))
    Yd = S(EDX, eightC)
    Zd = D(YZ)
    # round 5: [r2*(V-X3), S1*J]
    T1, T2 = _muls(tc, (r2, S(V, X3)), (S1, J))
    Y3 = S(T1, D(T2))

    p_inf = fp8t.is_zero_t(Z1)
    q_inf = fp8t.is_zero_t(Z2)
    h_zero = fp8t.is_zero_t(H)
    r_zero = fp8t.is_zero_t(Rr)
    dbl_case = h_zero & r_zero & ~p_inf & ~q_inf
    inv_case = h_zero & ~r_zero & ~p_inf & ~q_inf

    sel = fp8t.select_t
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


def _jac_dbl_t(tc, X1, Y1, Z1):
    S = lambda a, b: fp8t.sub_t(a, b, tc)
    A = lambda a, b: fp8t.add_t(a, b, tc)
    D = lambda a: fp8t.double_t(a, tc)
    Ad, Bd, YZ = _muls(tc, (X1, X1), (Y1, Y1), (Y1, Z1))
    X1pB = A(X1, Bd)
    Ed = A(D(Ad), Ad)
    Cd, XB2, Fd = _muls(tc, (Bd, Bd), (X1pB, X1pB), (Ed, Ed))
    Dd = D(S(S(XB2, Ad), Cd))
    X3 = S(Fd, D(Dd))
    (EDX,) = _muls(tc, (Ed, S(Dd, X3)))
    Y3 = S(EDX, D(D(D(Cd))))
    Z3 = D(YZ)
    return X3, Y3, Z3


def _aff_aff_add_t(tc, X1, Y1, inf1, X2, Y2, inf2):
    """Affine + affine -> Jacobian (mmadd-2007-bl + mdbl-2007-bl)."""
    S = lambda a, b: fp8t.sub_t(a, b, tc)
    A = lambda a, b: fp8t.add_t(a, b, tc)
    D = lambda a: fp8t.double_t(a, tc)
    one = jnp.broadcast_to(tc["one_mont"], X1.shape)

    H = S(X2, X1)
    ry = S(Y2, Y1)
    # round 1: [HH=H^2, XX=X1^2, YY=Y1^2]
    HH, XX, YY = _muls(tc, (H, H), (X1, X1), (Y1, Y1))
    I = D(D(HH))
    r = D(ry)
    M = A(D(XX), XX)
    X1pYY = A(X1, YY)
    # round 2: [J=H*I, V=X1*I, rr=r^2, YYYY=YY^2, T=(X1+YY)^2, MM=M^2]
    J, V, rr, YYYY, T, MM = _muls(
        tc, (H, I), (X1, I), (r, r), (YY, YY), (X1pYY, X1pYY), (M, M)
    )
    X3 = S(S(rr, J), D(V))
    Sd = D(S(S(T, XX), YYYY))
    Xd = S(MM, D(Sd))
    # round 3: [r*(V-X3), Y1*J, M*(S-Xd)]
    T1, T2, T3 = _muls(tc, (r, S(V, X3)), (Y1, J), (M, S(Sd, Xd)))
    Y3 = S(T1, D(T2))
    Z3 = D(H)
    Yd = S(T3, D(D(D(YYYY))))
    Zd = D(Y1)

    h_zero = fp8t.is_zero_t(H)
    r_zero = fp8t.is_zero_t(ry)
    dbl_case = h_zero & r_zero & ~inf1 & ~inf2
    inv_case = h_zero & ~r_zero & ~inf1 & ~inf2

    sel = fp8t.select_t
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


# ---------------------------------------------------------------------------
# pallas plumbing
# ---------------------------------------------------------------------------


def _tc_static(F):
    return {"L": F.L, "h": F.L // 2 if F.karatsuba else F.L,
            "karatsuba": F.karatsuba}


def _tc_from_refs(F, refs):
    tc = _tc_static(F)
    for name, ref in zip(fp8t.TC_ARRAYS, refs):
        tc[name] = ref[:]
    return tc


def _pad_to(x, B):
    b = x.shape[0]
    if b == B:
        return x
    pad = [(0, B - b)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _mask_to_i32(m):
    return m.astype(jnp.int32)[:, None]


@functools.lru_cache(maxsize=None)
def _build_jac_add(curve_key: str, bt: int):
    F = fp8.field8(P.CURVES[curve_key].q)
    L = F.L
    nconst = len(fp8t.TC_ARRAYS)

    def kernel(*refs):
        ins = refs[:6]
        consts = refs[6 : 6 + nconst]
        outs = refs[6 + nconst :]
        tc = _tc_from_refs(F, consts)
        vals = [r[:].T for r in ins]
        ox, oy, oz = _jac_add_t(tc, *vals)
        outs[0][:] = ox.T
        outs[1][:] = oy.T
        outs[2][:] = oz.T

    def call(p, q):
        B = p["x"].shape[0]
        Bp = -(-B // bt) * bt
        ins = [
            _pad_to(v, Bp)
            for v in (p["x"], p["y"], p["z"], q["x"], q["y"], q["z"])
        ]
        pt_spec = pl.BlockSpec((bt, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        consts = [F.tc[n] for n in fp8t.TC_ARRAYS]
        cspecs = [
            pl.BlockSpec(c.shape, (lambda i, nd=c.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for c in consts
        ]
        out = pl.pallas_call(
            kernel,
            grid=(Bp // bt,),
            in_specs=[pt_spec] * 6 + cspecs,
            out_specs=[pt_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((Bp, L), jnp.int32)] * 3,
            interpret=_interpret(),
        )(*ins, *consts)
        return {
            "x": out[0][:B],
            "y": out[1][:B],
            "z": out[2][:B],
        }

    return call


@functools.lru_cache(maxsize=None)
def _build_jac_dbl(curve_key: str, bt: int):
    F = fp8.field8(P.CURVES[curve_key].q)
    L = F.L
    nconst = len(fp8t.TC_ARRAYS)

    def kernel(*refs):
        ins = refs[:3]
        consts = refs[3 : 3 + nconst]
        outs = refs[3 + nconst :]
        tc = _tc_from_refs(F, consts)
        vals = [r[:].T for r in ins]
        ox, oy, oz = _jac_dbl_t(tc, *vals)
        outs[0][:] = ox.T
        outs[1][:] = oy.T
        outs[2][:] = oz.T

    def call(p):
        B = p["x"].shape[0]
        Bp = -(-B // bt) * bt
        ins = [_pad_to(v, Bp) for v in (p["x"], p["y"], p["z"])]
        pt_spec = pl.BlockSpec((bt, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        consts = [F.tc[n] for n in fp8t.TC_ARRAYS]
        cspecs = [
            pl.BlockSpec(c.shape, (lambda i, nd=c.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for c in consts
        ]
        out = pl.pallas_call(
            kernel,
            grid=(Bp // bt,),
            in_specs=[pt_spec] * 3 + cspecs,
            out_specs=[pt_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((Bp, L), jnp.int32)] * 3,
            interpret=_interpret(),
        )(*ins, *consts)
        return {"x": out[0][:B], "y": out[1][:B], "z": out[2][:B]}

    return call


@functools.lru_cache(maxsize=None)
def _build_aff_add(curve_key: str, bt: int):
    F = fp8.field8(P.CURVES[curve_key].q)
    L = F.L
    nconst = len(fp8t.TC_ARRAYS)

    def kernel(*refs):
        x1, y1, i1, x2, y2, i2 = refs[:6]
        consts = refs[6 : 6 + nconst]
        outs = refs[6 + nconst :]
        tc = _tc_from_refs(F, consts)
        inf1 = i1[:][:, 0] > 0
        inf2 = i2[:][:, 0] > 0
        ox, oy, oz = _aff_aff_add_t(
            tc, x1[:].T, y1[:].T, inf1, x2[:].T, y2[:].T, inf2
        )
        outs[0][:] = ox.T
        outs[1][:] = oy.T
        outs[2][:] = oz.T

    def call(a1, a2):
        B = a1["x"].shape[0]
        Bp = -(-B // bt) * bt
        ins = [
            _pad_to(a1["x"], Bp),
            _pad_to(a1["y"], Bp),
            _pad_to(_mask_to_i32(a1["inf"]), Bp),
            _pad_to(a2["x"], Bp),
            _pad_to(a2["y"], Bp),
            _pad_to(_mask_to_i32(a2["inf"]), Bp),
        ]
        pt_spec = pl.BlockSpec((bt, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        m_spec = pl.BlockSpec((bt, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        consts = [F.tc[n] for n in fp8t.TC_ARRAYS]
        cspecs = [
            pl.BlockSpec(c.shape, (lambda i, nd=c.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for c in consts
        ]
        out = pl.pallas_call(
            kernel,
            grid=(Bp // bt,),
            in_specs=[pt_spec, pt_spec, m_spec, pt_spec, pt_spec, m_spec]
            + cspecs,
            out_specs=[pt_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((Bp, L), jnp.int32)] * 3,
            interpret=_interpret(),
        )(*ins, *consts)
        return {"x": out[0][:B], "y": out[1][:B], "z": out[2][:B]}

    return call


# ---------------------------------------------------------------------------
# public API: a JacCurve-compatible ops object backed by the kernels
# ---------------------------------------------------------------------------


def _flatten_pt(pt):
    """Flatten leading dims of a point dict to one batch axis."""
    lead = None
    flat = {}
    for k, v in pt.items():
        if k == "inf":
            lead = v.shape
            flat[k] = v.reshape(-1)
        else:
            flat[k] = v.reshape(-1, v.shape[-1])
            if lead is None:
                lead = v.shape[:-1]
    return flat, lead


class PallasG1Curve:
    """Drop-in subset of JacCurve backed by fused Pallas kernels (G1 / any
    group whose coordinates live directly in Fq).  Field ops fall back to
    the batch-major fp8 path for cheap glue (select/mask/is_infinity)."""

    def __init__(self, curve_name: str, bt: int = DEFAULT_BT):
        self.curve_name = curve_name
        self.F = fp8.field8(P.CURVES[curve_name].q)
        self.bt = bt
        L = self.F.L
        self._add = _build_jac_add(curve_name, min(bt, _bt_cap("jac_add", L)))
        self._dbl = _build_jac_dbl(curve_name, min(bt, _bt_cap("jac_dbl", L)))
        self._aff = _build_aff_add(curve_name, min(bt, _bt_cap("aff_add", L)))

    # -- kernel-backed ops ------------------------------------------------
    def add(self, p, q):
        fp_, lead = _flatten_pt(p)
        fq_, _ = _flatten_pt(q)
        out = self._add(fp_, fq_)
        return {k: v.reshape(*lead, v.shape[-1]) for k, v in out.items()}

    def dbl(self, p):
        fp_, lead = _flatten_pt(p)
        out = self._dbl(fp_)
        return {k: v.reshape(*lead, v.shape[-1]) for k, v in out.items()}

    def add_affine_affine(self, a1, a2, z_one=None):
        f1, lead = _flatten_pt(a1)
        f2, _ = _flatten_pt(a2)
        out = self._aff(f1, f2)
        return {k: v.reshape(*lead, v.shape[-1]) for k, v in out.items()}

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
