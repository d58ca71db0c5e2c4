"""In-circuit Groth16 verifier for BLS12-377 proofs inside a BW6-761 circuit.

Mirrors the reference verifier-gadget split (aggregator_gadget.tcc:27-71):
a shared verification-key "process" step (G2 line chains built once per
batch) and per-proof "online" verification emitting a RESULT BIT rather than
constraining validity (aggregator_circuit.hpp:51-54) so invalid nested
proofs are tolerated.

Verification equation (libzeth convention, gamma = 1):
    e(A, B) * e(-alpha, beta) * e(-acc, [1]_2) * e(-C, delta) == 1
with acc = ABC_0 + sum_j input_j * ABC_{j+1}.  The gamma chain pairs with
the *constant* G2 generator, so its line coefficients are host-precomputed
constants (zero constraint cost).

Proof points get in-circuit on-curve checks (as libsnark's proof_variable
does via its G1/G2 checker gadgets); VK points are bound byte-exactly by the
MiMC hash and validated at registration time, so they carry no in-circuit
curve check (same trust split as the reference).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

from ..ec import host_curve as hc
from ..ff import params as P
from .curve_ops import CurveGadget
from .field_ext import gadget_towers
from .packing import unpack_bits
from .pairing_gadget import BLS12PairingGadget, LineCoeffs
from .protoboard import LC, Protoboard


@dataclasses.dataclass
class VkVariable:
    """Allocated verification-key variables (points over gadget fields)."""

    alpha: tuple  # G1
    beta: tuple  # G2
    delta: tuple  # G2
    abc: List[tuple]  # G1 list

    def points(self) -> List[tuple]:
        """Hash/coordinate order (documented contract, see vk_hash.py)."""
        return [self.alpha, self.beta, self.delta, *self.abc]


def groth16_vk_host_points(host_vk) -> List[object]:
    """Host-side points in the same order as VkVariable.points()."""
    return [host_vk.alpha, host_vk.beta, host_vk.delta, *host_vk.abc]


@dataclasses.dataclass
class ProofVariable:
    a: tuple  # G1
    b: tuple  # G2
    c: tuple  # G1


@dataclasses.dataclass
class ProcessedVk:
    vk: VkVariable
    beta_chain: List[LineCoeffs]
    delta_chain: List[LineCoeffs]
    gamma_chain: List[LineCoeffs]  # constant chain


class Groth16VerifierGadget:
    """Nested Groth16 verification arithmetized over the wrapper scalar
    field.  Supports both curve pairs (BLS12-377 inside BW6-761 and
    MNT4-298 inside MNT6-298, reference ZECALE_CURVE options)."""

    snark_name = "GROTH16"

    def __init__(self, pb: Protoboard, nested_curve: str = "bls12-377"):
        self.NESTED_CURVE = nested_curve
        assert pb.r == P.CURVES[nested_curve].q, (
            "wrapper scalar field must equal the nested base field"
        )
        self.pb = pb
        self.towers = gadget_towers(pb, self.NESTED_CURVE)
        if nested_curve == "bls12-377":
            self.pairing = BLS12PairingGadget(pb, self.towers)
        elif nested_curve == "mnt4-298":
            from .mnt_pairing_gadget import MNT4PairingGadget

            self.pairing = MNT4PairingGadget(pb, self.towers)
        else:
            raise KeyError(nested_curve)
        host_g1 = hc.g1_curve(self.NESTED_CURVE)
        self.host_g1 = host_g1
        self.host_g2 = hc.g2_curve(self.NESTED_CURVE)
        self.g1_gadget = CurveGadget(
            self.towers["fq"], host_g1.a, host_g1.b
        )
        self.g2_gadget = self.pairing.g2_gadget
        self.scalar_bits = P.CURVES[self.NESTED_CURVE].r.bit_length()

        # MSM offset point: fixed subgroup point with precomputed 2^n multiple
        self._offset_D = host_g1._mul_raw(
            0xD00D_F00D_0BADBEEF, hc.generators(self.NESTED_CURVE)[0]
        )
        self._offset_final = host_g1._mul_raw(
            1 << self.scalar_bits, self._offset_D
        )

    # ------------------------------------------------------------------
    # variable allocation + witness setters
    # ------------------------------------------------------------------
    def alloc_vk(self, num_inputs: int) -> VkVariable:
        g1a = self.g1_gadget.alloc_point
        g2a = self.g2_gadget.alloc_point
        return VkVariable(
            alpha=g1a(),
            beta=g2a(),
            delta=g2a(),
            abc=[g1a() for _ in range(num_inputs + 1)],
        )

    def check_vk_shape(self, host_vk, num_inputs: int) -> bool:
        return len(host_vk.abc) == num_inputs + 1

    def set_vk_witness(self, w, vkvar: VkVariable, host_vk) -> None:
        self.g1_gadget.set_point_witness(w, vkvar.alpha, host_vk.alpha)
        self.g2_gadget.set_point_witness(w, vkvar.beta, host_vk.beta)
        self.g2_gadget.set_point_witness(w, vkvar.delta, host_vk.delta)
        assert len(host_vk.abc) == len(vkvar.abc)
        for var, pt in zip(vkvar.abc, host_vk.abc):
            self.g1_gadget.set_point_witness(w, var, pt)

    def alloc_proof(self) -> ProofVariable:
        return ProofVariable(
            a=self.g1_gadget.alloc_point(),
            b=self.g2_gadget.alloc_point(),
            c=self.g1_gadget.alloc_point(),
        )

    def set_proof_witness(self, w, pvar: ProofVariable, host_proof) -> None:
        self.g1_gadget.set_point_witness(w, pvar.a, host_proof.a)
        self.g2_gadget.set_point_witness(w, pvar.b, host_proof.b)
        self.g1_gadget.set_point_witness(w, pvar.c, host_proof.c)

    # ------------------------------------------------------------------
    # vk processing (shared per batch)
    # ------------------------------------------------------------------
    def process_vk(self, vkvar: VkVariable) -> ProcessedVk:
        return ProcessedVk(
            vk=vkvar,
            beta_chain=self.pairing.g2_precompute(vkvar.beta),
            delta_chain=self.pairing.g2_precompute(vkvar.delta),
            gamma_chain=self.pairing.g2_precompute_const(
                P.gamma_g2(self.NESTED_CURVE)
            ),
        )

    # ------------------------------------------------------------------
    # online verification (per proof)
    # ------------------------------------------------------------------
    def verify(
        self,
        pvk: ProcessedVk,
        proof: ProofVariable,
        input_lcs: Sequence[LC],
    ) -> LC:
        """Emit the result bit for one nested proof."""
        pb = self.pb
        g1 = self.g1_gadget

        # on-curve checks for proof points (constrained, not result-gated)
        g1.enforce_on_curve(proof.a)
        g1.enforce_on_curve(proof.c)
        self.g2_gadget.enforce_on_curve(proof.b)

        # acc = ABC_0 + sum_j input_j * ABC_{j+1}
        bit_lists = [
            unpack_bits(pb, lc, self.scalar_bits) for lc in input_lcs
        ]
        assert len(bit_lists) + 1 == len(pvk.vk.abc)
        msm = g1.msm_with_offset(
            pvk.vk.abc[1:], bit_lists, self._offset_D, self._offset_final
        )
        acc = g1.add_unequal(msm, pvk.vk.abc[0])

        b_chain = self.pairing.g2_precompute(proof.b)
        pairs = [
            (b_chain, proof.a),
            (pvk.beta_chain, g1.neg(pvk.vk.alpha)),
            (pvk.gamma_chain, g1.neg(acc)),
            (pvk.delta_chain, g1.neg(proof.c)),
        ]
        result = self.pairing.pairing_product_result(pairs)
        return self.pairing.is_one_bit(result)
