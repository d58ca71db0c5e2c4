"""Multi-chip sharding of the prover kernels over a jax.sharding.Mesh.

Replaces the reference's intra-host OpenMP parallelism (SURVEY.md section
2c) with the TPU-native substrate:

  * MSM: points/scalars sharded along the point axis under shard_map; each
    chip reduces its shard with the scatter-free bucket kernel, partial
    results are combined with an all_gather + log-tree of group adds over
    ICI.
  * FFT: value axis sharded; butterfly stages whose span crosses the shard
    boundary exchange data via XLA-inserted collectives (GSPMD partitioning
    of the gather/reshape network under sharding constraints).

Tested on a virtual CPU mesh (xla_force_host_platform_device_count) and
dry-run by the driver via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS
from jax.experimental.shard_map import shard_map

from ..ec import msm_tpu
from ..ff import fp_jax
from ..poly import fft_tpu

AXIS = "points"


def make_mesh(n_devices: int) -> Mesh:
    devs = jax.devices()[:n_devices]
    # Auto axis type: with_sharding_constraint (GSPMD) needs Auto axes in
    # jax 0.9 (Explicit meshes require the reshard API instead).
    return jax.make_mesh(
        (len(devs),),
        (AXIS,),
        axis_types=(jax.sharding.AxisType.Auto,),
        devices=devs,
    )


def _pt_specs(pts: dict, shard_first: bool):
    """PartitionSpec pytree for a Jacobian point dict."""
    out = {}
    for k, v in pts.items():
        if shard_first:
            out[k] = PS(AXIS, *([None] * (v.ndim - 1)))
        else:
            out[k] = PS(*([None] * v.ndim))
    return out


def msm_sharded(curve_name: str, mesh: Mesh, digits, pts: dict, c: int, g2: bool = False):
    """Distributed MSM: shard the point axis, combine partials over ICI."""
    crv = (
        msm_tpu.g2_curve_tpu(curve_name) if g2 else msm_tpu.g1_curve_tpu(curve_name)
    )

    def local(digits_l, pts_l):
        part = crv.msm_pippenger(digits_l, pts_l, c)
        gathered = {
            k: jax.lax.all_gather(v, AXIS) for k, v in part.items()
        }
        return crv.tree_reduce(gathered)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(PS(None, AXIS), _pt_specs(pts, True)),
        out_specs=_pt_specs({k: v[0] for k, v in pts.items()}, False),
        check_rep=False,  # scan carries inside the kernel are unvarying
    )
    return fn(digits, pts)


def fft_sharded(mesh: Mesh, values, r: int, inverse: bool = False):
    """FFT with the element axis sharded; XLA partitions the butterfly
    network (cross-shard stages become collectives)."""
    sharding = NamedSharding(mesh, PS(AXIS, None))

    @functools.partial(jax.jit, out_shardings=sharding)
    def run(v):
        v = jax.lax.with_sharding_constraint(v, sharding)
        return fft_tpu.fft(v, r, inverse=inverse)

    return run(jax.device_put(values, sharding))


def msm8_sharded(
    curve_name: str,
    mesh: Mesh,
    scal8,
    pts_aff: dict,
    c: int,
    g2: bool = False,
    use_pallas: bool | None = None,
):
    """Distributed round-2 MSM: the point axis is sharded, each device runs
    the full sort-based bucket engine (ec/msm8.py) on its shard, and the D
    Jacobian partials are combined with an all_gather + log-tree of group
    adds over ICI.  Returns a replicated Jacobian point."""
    from ..ec import msm8 as m8
    from ..ff import params as P

    if use_pallas is None:
        use_pallas = (
            jax.default_backend() != "cpu"
            and m8._pallas_supported(curve_name, g2)
        )
    if use_pallas:
        from ..ec import ec_pallas

        crv = ec_pallas.PallasProjCurve(curve_name, g2=g2)
    else:
        crv = m8.g2_pcurve8(curve_name) if g2 else m8.g1_pcurve8(curve_name)
    nbits = P.CURVES[curve_name].r.bit_length()

    def local(scal_l, pts_l):
        buckets, signs = m8.signed_digits_from_limbs8(scal_l, nbits, c)
        # keep the per-device partial PROJECTIVE: reduce across devices in
        # the complete law, convert to Jacobian once at the very end
        part = m8.msm8_core(
            crv, crv.F, buckets, signs, pts_l, c, out_jacobian=False
        )
        gathered = {k: jax.lax.all_gather(v, AXIS) for k, v in part.items()}
        return crv.to_jacobian(m8._axis0_tree_reduce(crv, gathered))

    pt_in = {
        k: PS(AXIS, *([None] * (v.ndim - 1))) for k, v in pts_aff.items()
    }
    sample = {k: v[0] for k, v in pts_aff.items() if k != "inf"}
    pt_out = {k: PS(*([None] * v.ndim)) for k, v in sample.items()}
    pt_out["z"] = pt_out["x"]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(PS(AXIS, None), pt_in),
        out_specs={"x": pt_out["x"], "y": pt_out["y"], "z": pt_out["z"]},
        check_rep=False,
    )
    from ..utils.jit_utils import bound_jit

    return bound_jit([crv.F], fn)(scal8, pts_aff)


def msm4_sharded(
    curve_name: str,
    mesh: Mesh,
    scal8,
    pts_aff: dict,
    g2: bool = False,
    c: int = 0,
    calib: tuple = (),
    use_pallas: bool | None = None,
):
    """Distributed round-4/5 dense-bucket MSM (ec/msm4.py): the point axis
    is sharded, each device runs the full dense bucket-matrix pipeline on
    its shard (per-shard plan — identical across devices since shards are
    equal), lazy PROJECTIVE partials are combined with an all_gather +
    log-tree of complete lazy adds over ICI, canonicalized once.  Returns
    a replicated Jacobian point in the engine's usual output form.

    ``calib``: per-window sub-lane envelopes measured on the GLOBAL
    scalars (per-shard bucket counts are bounded by the global counts, so
    the global envelope is safe on every shard)."""
    from ..ec import msm4
    from ..ff import fp8q
    from ..utils.jit_utils import bound_jit

    D = mesh.devices.size
    n = pts_aff["x"].shape[0]
    assert n % D == 0, "point count must divide the mesh"
    plan = msm4.make_plan(curve_name, g2, n // D, c, calib)
    F, ctx = msm4._field_ctx(curve_name, plan.fq2)
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"

    def local(scal_l, pts_l):
        acc = msm4._msm4_run(
            plan, F, ctx, scal_l, pts_l, use_pallas, as_projective=True
        )
        # (D, ew, 1) per coordinate -> lanes-last for the tree
        g = {
            k: jnp.moveaxis(jax.lax.all_gather(v, AXIS), 0, -1)[..., 0, :]
            for k, v in acc.items()
        }
        ops = msm4._make_ops(plan, F.tc, ctx.nr_t if ctx else None)
        b3 = msm4._b3_of(plan, ctx)
        cc = D
        while cc > 1:
            h = cc // 2
            p1 = {k: v[..., :h] for k, v in g.items()}
            p2 = {k: v[..., h : 2 * h] for k, v in g.items()}
            s = fp8q.proj_add_q(ops, p1, p2, b3)
            if cc % 2:
                tail = {k: v[..., 2 * h : cc] for k, v in g.items()}
                s = {
                    k: jnp.concatenate([v, tail[k]], axis=-1)
                    for k, v in s.items()
                }
                cc = h + 1
            else:
                cc = h
            g = s
        return msm4.finalize_projective(plan, F, ctx, g)

    pt_in = {
        k: PS(AXIS, *([None] * (v.ndim - 1))) for k, v in pts_aff.items()
    }
    if plan.fq2:
        out_specs = {
            "x": PS(None, None), "y": PS(None, None), "z": PS(None, None)
        }
    else:
        out_specs = {"x": PS(None), "y": PS(None), "z": PS(None)}

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(PS(AXIS, None), pt_in),
        out_specs=out_specs,
        check_rep=False,
    )
    binders = [F] + ([ctx] if ctx else [])
    return bound_jit(binders, fn)(scal8, pts_aff)


def prove_core_sharded8(
    curve_name: str,
    mesh: Mesh,
    az,
    bz,
    cz,
    zinv_mont,
    h_points_rev_aff: dict,
    c: int,
    use_pallas: bool | None = None,
):
    """Round-2 distributed prover heart: the QAP division runs as the
    explicit-butterfly distributed FFT (parallel/fft_dist.py — cross-shard
    stages are ppermute half-exchanges), H flows ON DEVICE (Montgomery
    16-bit planes -> standard 8-bit planes) into the sharded bucket-MSM.
    Returns (H coefficients, BIT-REVERSED order, sharded; MSM point).

    ``h_points_rev_aff``: the H query permuted by
    fft_dist.bitrev_permutation(n) — a static host-side reorder of fixed
    proving-key points, matching H's bit-reversed order."""
    from ..ff import fp8
    from ..ff import params as P
    from ..utils.jit_utils import bound_jit
    from . import fft_dist

    r = P.CURVES[curve_name].r
    F16 = fp_jax.field(r)
    F8 = fp8.field8(r)
    h = fft_dist.h_pipeline_sharded(mesh, r, az, bz, cz, zinv_mont)
    to8 = bound_jit(
        [F16], lambda x: fp8.limbs16_to_8(F16.from_mont(x), F8.L)
    )
    h8 = to8(h)
    msm_out = msm8_sharded(
        curve_name, mesh, h8, h_points_rev_aff, c, use_pallas=use_pallas
    )
    return h, msm_out


def prove_core_sharded(
    curve_name: str,
    mesh: Mesh,
    az,
    bz,
    cz,
    zinv_mont,
    h_digits,
    h_points: dict,
    c: int,
):
    """The distributed heart of the Groth16 prover: QAP division via sharded
    FFTs + the H-query MSM via the sharded bucket kernel.  One jittable
    step, real shardings (data-parallel point axis + "sequence-parallel"
    polynomial axis)."""
    from ..ff import params as P

    r = P.CURVES[curve_name].r
    F = fp_jax.field(r)
    val_sh = NamedSharding(mesh, PS(AXIS, None))

    def h_pipeline(a, b, cc):
        a_c = fft_tpu.fft(a, r, inverse=True)
        b_c = fft_tpu.fft(b, r, inverse=True)
        c_c = fft_tpu.fft(cc, r, inverse=True)
        a_e = fft_tpu.coset_fft(a_c, r)
        b_e = fft_tpu.coset_fft(b_c, r)
        c_e = fft_tpu.coset_fft(c_c, r)
        h_e = F.mont_mul(
            F.sub(F.mont_mul(a_e, b_e), c_e),
            jnp.broadcast_to(zinv_mont, a_e.shape),
        )
        return fft_tpu.coset_ifft(h_e, r)

    crv = msm_tpu.g1_curve_tpu(curve_name)

    def msm_local(digits_l, pts_l):
        part = crv.msm_pippenger(digits_l, pts_l, c)
        gathered = {k: jax.lax.all_gather(v, AXIS) for k, v in part.items()}
        return crv.tree_reduce(gathered)

    msm_fn = shard_map(
        msm_local,
        mesh=mesh,
        in_specs=(PS(None, AXIS), _pt_specs(h_points, True)),
        out_specs=_pt_specs({k: v[0] for k, v in h_points.items()}, False),
        check_rep=False,  # scan carries inside the kernel are unvarying
    )

    @jax.jit
    def step(a, b, cc, dg, pts):
        a = jax.lax.with_sharding_constraint(a, val_sh)
        b = jax.lax.with_sharding_constraint(b, val_sh)
        cc = jax.lax.with_sharding_constraint(cc, val_sh)
        h = h_pipeline(a, b, cc)
        msm_out = msm_fn(dg, pts)
        return h, msm_out

    return step(az, bz, cz, h_digits, h_points)
