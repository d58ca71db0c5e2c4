"""Nested-verification-key hash gadget.

Binds the wrapper proof to one specific nested verification key by exposing
MiMC(vk coordinates) as a primary input (reference:
verification_key_hash_gadget.{hpp,tcc}; the in-circuit digest must equal the
out-of-circuit ``compute_hash`` the server returns from
GetNestedVerificationKeyHash, aggregator_server.cpp:170-188).

Coordinate order (documented contract of this framework):
  alpha.x, alpha.y,
  beta.x.c0, beta.x.c1, beta.y.c0, beta.y.c1,
  delta.x.c0, delta.x.c1, delta.y.c0, delta.y.c1,
  abc[0].x, abc[0].y, ..., abc[n].x, abc[n].y
(extension coefficients low-first; for higher-degree G2 fields the
flattened coefficient list is used analogously).
"""

from __future__ import annotations

from typing import List

from ..ff import host_field as hf
from . import mimc
from .protoboard import LC, Protoboard


def _flatten_point_lcs(gadget_field_point) -> List[LC]:
    out: List[LC] = []
    for coord in gadget_field_point:
        if isinstance(coord, LC):
            out.append(coord)
        else:
            # extension element: tuple tree of LCs, flatten low-first
            stack = [coord]
            flat: List[LC] = []

            def rec(e):
                if isinstance(e, LC):
                    flat.append(e)
                else:
                    for c in e:
                        rec(c)

            rec(coord)
            out.extend(flat)
    return out


def vk_coordinate_lcs(vkvar) -> List[LC]:
    """Flatten any vk-variable's points (its ``points()`` order contract;
    Groth16: alpha, beta, delta, abc...; PGHR13: a, b, c, g, gb1, gb2, z,
    ic... -- see the VkVariable dataclasses)."""
    lcs: List[LC] = []
    for pt in vkvar.points():
        lcs.extend(_flatten_point_lcs(pt))
    return lcs


def vk_hash_gadget(pb: Protoboard, vkvar) -> LC:
    """In-circuit MiMC digest of the vk coordinates."""
    return mimc.mimc_hash_inputs_gadget(pb, vk_coordinate_lcs(vkvar))


def _flatten_host_coord(coord, ext_field) -> List[int]:
    if isinstance(coord, int):
        return [coord]
    return ext_field.to_list(coord)


def _host_vk_points(host_vk) -> List[object]:
    """Ordered host points for either snark's vk (mirrors points())."""
    if hasattr(host_vk, "abc"):  # Groth16
        return [host_vk.alpha, host_vk.beta, host_vk.delta, *host_vk.abc]
    # PGHR13 (zeth naming)
    return [host_vk.a, host_vk.b, host_vk.c, host_vk.g, host_vk.gb1,
            host_vk.gb2, host_vk.z, *host_vk.ic]


def compute_vk_hash(nested_curve: str, host_vk, wrapper_r: int) -> int:
    """Out-of-circuit digest equal to the gadget's value (reference analog:
    verification_key_hash_gadget::compute_hash, tcc:42-59)."""
    fg2 = hf.towers(nested_curve)["fg2"]
    vals: List[int] = []
    for pt in _host_vk_points(host_vk):
        vals += _flatten_host_coord(pt[0], fg2) + _flatten_host_coord(pt[1], fg2)
    return mimc.mimc_hash_inputs(vals, wrapper_r)
