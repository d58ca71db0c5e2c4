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
