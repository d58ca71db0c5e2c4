"""Groth16 zk-SNARK over any supported curve: data types, host verifier,
host prover and setup.

The proving/verification *key shapes* mirror the reference's libzeth
"simplified" Groth16 (gamma fixed to 1, so the verification key is
{alpha, beta, delta, ABC}; see testdata/dummy_app/vk.json and
contracts/Groth16BW6_761.sol vk layout [alpha, -beta, -delta, abc...]).

The host prover here is the exact-math oracle; the production prover runs the
same algebra as batched JAX/Pallas kernels (zecale_tpu/snark/groth16_tpu.py).

Groth16 (with gamma = 1):
  setup:  tau, alpha, beta, delta random;
          A_i(tau), B_i(tau), C_i(tau) the QAP polynomials at tau.
    pk: [alpha]1, [beta]1, [beta]2, [delta]1, [delta]2,
        [A_i(tau)]1,
        [B_i(tau)]1, [B_i(tau)]2,
        [(beta A_i + alpha B_i + C_i)/delta]1   for private i,
        [tau^i Z(tau)/delta]1
    vk: [alpha]1, [beta]2, [delta]2,
        ABC_i = [(beta A_i + alpha B_i + C_i)]1 for public i  (gamma == 1)
  prove(r, s):
    A = [alpha + A(tau,w) + r delta]1
    B = [beta + B(tau,w) + s delta]2
    C = [(sum_priv w_i (beta A_i + alpha B_i + C_i) + H(tau) Z(tau)) / delta
         + s A + r B1 - r s delta]1
  verify: e(A, B) == e(alpha, beta) * e(acc, [1]2) * e(C, delta),
          acc = ABC_0 + sum_i input_i ABC_{i+1}
"""

from __future__ import annotations

import dataclasses
import random
from typing import Any, List, Optional, Sequence

from ..ec import host_curve as hc
from ..ff import host_field as hf
from ..ff import params as P
from ..pairing import host_pairing as hp
from ..snark.r1cs import R1CS


@dataclasses.dataclass
class Groth16Proof:
    a: Any  # G1
    b: Any  # G2
    c: Any  # G1


@dataclasses.dataclass
class Groth16VerificationKey:
    alpha: Any  # G1
    beta: Any  # G2
    delta: Any  # G2
    abc: List[Any]  # G1 list, length = num_primary_inputs + 1


@dataclasses.dataclass
class Groth16ProvingKey:
    alpha_g1: Any
    beta_g1: Any
    beta_g2: Any
    delta_g1: Any
    delta_g2: Any
    a_query: List[Any]  # [A_i(tau)]1, indexed by variable (0..num_vars)
    b_g1_query: List[Any]
    b_g2_query: List[Any]
    l_query: List[Any]  # private-input query, indexed from first private var
    h_query: List[Any]  # [tau^i Z(tau)/delta]1, i in 0..domain-2


@dataclasses.dataclass
class Groth16KeyPair:
    pk: Groth16ProvingKey
    vk: Groth16VerificationKey


@dataclasses.dataclass
class ExtendedProof:
    """Proof plus its primary inputs (reference: libzeth extended_proof)."""

    proof: Groth16Proof
    inputs: List[int]


class Groth16:
    """Groth16 over the named curve, host (exact) implementation."""

    name = "GROTH16"

    def __init__(self, curve_name: str):
        self.curve_name = curve_name
        self.params = P.CURVES[curve_name]
        self.ctx = hp.ctx(curve_name)
        self.g1 = self.ctx.g1
        self.g2 = self.ctx.g2
        self.fr = hf.PrimeField(self.params.r)

    # ------------------------------------------------------------------
    # verification
    # ------------------------------------------------------------------
    def verify(
        self,
        inputs: Sequence[int],
        proof: Groth16Proof,
        vk: Groth16VerificationKey,
    ) -> bool:
        if len(inputs) + 1 != len(vk.abc):
            return False
        for pt, crv in ((proof.a, self.g1), (proof.b, self.g2), (proof.c, self.g1)):
            if not crv.is_on_curve(pt):
                return False
        r = self.params.r
        acc = vk.abc[0]
        for x, pt in zip(inputs, vk.abc[1:]):
            acc = self.g1.add(acc, self.g1.mul(x % r, pt))
        # e(A,B) * e(-alpha, beta) * e(-acc, [gamma]_2) * e(-C, delta) == 1
        # (gamma fixed to 1 in setup => [gamma]_2 is the curve's G2 generator
        # constant; see zecale_tpu.ff.params.gamma_g2)
        g2_gen = P.gamma_g2(self.curve_name)
        pairs = [
            (proof.a, proof.b),
            (self.g1.neg(vk.alpha), vk.beta),
            (self.g1.neg(acc), g2_gen),
            (self.g1.neg(proof.c), vk.delta),
        ]
        return self._pairing_product_is_one(pairs)

    def _pairing_product_is_one(self, pairs) -> bool:
        """Pairing check: the native C engine when available for the curve
        (~50x the Python oracle; differentially validated in
        tests/test_native_pairing.py), the host oracle otherwise."""
        try:
            from ..native import pairing as _np

            if self.curve_name == "bw6-761":
                npair = _np.bw6()
            elif self.curve_name == "bls12-377":
                npair = _np.bls12()
            else:  # MNT4-298 / MNT6-298: generic dense-line engine
                npair = _np.generic(self.curve_name)
        except Exception:
            npair = None
        if npair is not None:
            return npair.pairing_product_is_one(pairs)
        return self.ctx.pairing_product_is_one(pairs)

    # ------------------------------------------------------------------
    # trusted setup (host oracle; see groth16_tpu for the batched path)
    # ------------------------------------------------------------------
    def generate_setup(
        self, r1cs: R1CS, rng: Optional[random.Random] = None
    ) -> Groth16KeyPair:
        rng = rng or random.Random()
        fr = self.fr
        r = self.params.r

        tau = rng.randrange(1, r)
        alpha = rng.randrange(1, r)
        beta = rng.randrange(1, r)
        delta = rng.randrange(1, r)

        num_vars = r1cs.num_variables  # includes the constant ONE as var 0
        num_pub = r1cs.num_primary + 1  # +1 for ONE

        a_at, b_at, c_at = r1cs.qap_evaluations(tau, r)
        domain_size, z_tau = r1cs.domain_vanishing(tau, r)

        delta_inv = pow(delta, r - 2, r)

        g1gen, g2gen = hc.generators(self.curve_name)

        def G1(k: int):
            return self.g1.mul(k % r, g1gen)

        def G2(k: int):
            return self.g2.mul(k % r, g2gen)

        a_query = [G1(a_at[i]) for i in range(num_vars)]
        b_g1 = [G1(b_at[i]) for i in range(num_vars)]
        b_g2 = [G2(b_at[i]) for i in range(num_vars)]

        abc = []
        for i in range(num_pub):
            abc.append(G1((beta * a_at[i] + alpha * b_at[i] + c_at[i]) % r))
        l_query = []
        for i in range(num_pub, num_vars):
            l_query.append(
                G1(
                    (beta * a_at[i] + alpha * b_at[i] + c_at[i])
                    * delta_inv
                    % r
                )
            )
        h_query = []
        t_pow = 1
        for _ in range(domain_size - 1):
            h_query.append(G1(t_pow * z_tau % r * delta_inv % r))
            t_pow = t_pow * tau % r

        pk = Groth16ProvingKey(
            alpha_g1=G1(alpha),
            beta_g1=G1(beta),
            beta_g2=G2(beta),
            delta_g1=G1(delta),
            delta_g2=G2(delta),
            a_query=a_query,
            b_g1_query=b_g1,
            b_g2_query=b_g2,
            l_query=l_query,
            h_query=h_query,
        )
        vk = Groth16VerificationKey(
            alpha=G1(alpha), beta=G2(beta), delta=G2(delta), abc=abc
        )
        return Groth16KeyPair(pk=pk, vk=vk)

    # ------------------------------------------------------------------
    # proving (host oracle)
    # ------------------------------------------------------------------
    def prove(
        self,
        r1cs: R1CS,
        pk: Groth16ProvingKey,
        assignment: Sequence[int],
        rng: Optional[random.Random] = None,
    ) -> Groth16Proof:
        """``assignment`` is the full variable assignment including var 0 == 1."""
        rng = rng or random.Random()
        r = self.params.r
        num_pub = r1cs.num_primary + 1

        h_coeffs = r1cs.h_coefficients(assignment, r)

        rr = rng.randrange(r)
        ss = rng.randrange(r)

        g1 = self.g1

        def msm_g1(scalars, points):
            return g1.msm(scalars, points)

        ev_a = msm_g1(assignment, pk.a_query)
        ev_b1 = msm_g1(assignment, pk.b_g1_query)
        ev_b2 = self.g2.msm(assignment, pk.b_g2_query)
        ev_l = msm_g1(assignment[num_pub:], pk.l_query)
        ev_h = msm_g1(h_coeffs, pk.h_query)

        A = g1.add(g1.add(pk.alpha_g1, ev_a), g1.mul(rr, pk.delta_g1))
        B = self.g2.add(
            self.g2.add(pk.beta_g2, ev_b2), self.g2.mul(ss, pk.delta_g2)
        )
        B1 = g1.add(g1.add(pk.beta_g1, ev_b1), g1.mul(ss, pk.delta_g1))
        C = g1.add(
            g1.add(ev_l, ev_h),
            g1.add(
                g1.add(g1.mul(ss, A), g1.mul(rr, B1)),
                g1.neg(g1.mul(rr * ss % r, pk.delta_g1)),
            ),
        )
        return Groth16Proof(a=A, b=B, c=C)
