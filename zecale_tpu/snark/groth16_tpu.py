"""Groth16 prover/setup on the JAX/TPU compute path.

Same algebra as the host oracle (zecale_tpu/snark/groth16.py) with the bulk
work on device:

  * QAP witness reduction (iFFT -> coset FFT -> pointwise -> coset iFFT)
    via zecale_tpu.poly.fft_tpu over Montgomery limb planes;
  * the five proof MSMs (A, B1, B2, L, H) via the batched Jacobian kernels;
  * trusted setup via batched fixed-base scalar multiplication.

The proving key is packed to device arrays once (DevicePk) and reused across
proofs, mirroring the reference's load-keypair-then-serve lifecycle
(aggregator_server.cpp:483-514).
"""

from __future__ import annotations

import dataclasses
import random
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ec import host_curve as hc
from ..ec import msm_tpu
from ..ff import fp_jax
from ..ff import limb as lb
from ..ff import params as P
from ..poly import fft_tpu
from ..poly.domain_host import domain
from .groth16 import (
    Groth16KeyPair,
    Groth16Proof,
    Groth16ProvingKey,
    Groth16VerificationKey,
)
from .r1cs import R1CS


@dataclasses.dataclass
class DevicePk:
    """Proving key resident on device (points packed, Montgomery form)."""

    curve_name: str
    num_pub: int
    alpha_g1: tuple
    beta_g1: tuple
    beta_g2: tuple
    delta_g1: tuple
    delta_g2: tuple
    a_query: dict
    b_g1_query: dict
    b_g2_query: dict
    l_query: dict
    h_query: dict


def pack_pk(curve_name: str, pk: Groth16ProvingKey, num_pub: int) -> DevicePk:
    return DevicePk(
        curve_name=curve_name,
        num_pub=num_pub,
        alpha_g1=pk.alpha_g1,
        beta_g1=pk.beta_g1,
        beta_g2=pk.beta_g2,
        delta_g1=pk.delta_g1,
        delta_g2=pk.delta_g2,
        a_query=msm_tpu.pack_g1_points(curve_name, pk.a_query),
        b_g1_query=msm_tpu.pack_g1_points(curve_name, pk.b_g1_query),
        b_g2_query=msm_tpu.pack_g2_points(curve_name, pk.b_g2_query),
        l_query=msm_tpu.pack_g1_points(curve_name, pk.l_query),
        h_query=msm_tpu.pack_g1_points(curve_name, pk.h_query),
    )


class Groth16TPU:
    """TPU-path Groth16 over the named curve."""

    name = "GROTH16"

    def __init__(self, curve_name: str):
        self.curve_name = curve_name
        self.params = P.CURVES[curve_name]
        self.r = self.params.r
        self.Fr = fp_jax.field(self.r)
        self.g1_host = hc.g1_curve(curve_name)
        self.g2_host = hc.g2_curve(curve_name)
        self.g1_tpu = msm_tpu.g1_curve_tpu(curve_name)
        self.g2_tpu = msm_tpu.g2_curve_tpu(curve_name)

    # ------------------------------------------------------------------
    # batched fixed-base scalar multiplication (for setup)
    # ------------------------------------------------------------------
    def _batch_scalar_mul(self, crv_tpu, pack_pt, scalars: Sequence[int], base):
        """[k_i] * base for all i, on device."""
        n = len(scalars)
        bits = msm_tpu.scalar_bit_planes(
            [s % self.r for s in scalars], self.r.bit_length()
        )
        base_batch = pack_pt(self.curve_name, [base] * n)

        def body(acc, bit_row):
            acc = crv_tpu.dbl(acc)
            added = crv_tpu.add(acc, base_batch)
            acc = crv_tpu.select(bit_row > 0, added, acc)
            return acc, None

        acc0 = {k: jnp.zeros_like(v) for k, v in base_batch.items()}
        acc, _ = jax.lax.scan(body, acc0, bits)
        return acc

    def batch_mul_g1(self, scalars, base=None):
        base = base or hc.generators(self.curve_name)[0]
        acc = self._batch_scalar_mul(
            self.g1_tpu, msm_tpu.pack_g1_points, scalars, base
        )
        return [
            msm_tpu.unpack_g1_point(
                self.curve_name, {k: v[i] for k, v in acc.items()}
            )
            for i in range(len(scalars))
        ]

    def batch_mul_g2(self, scalars, base=None):
        base = base or hc.generators(self.curve_name)[1]
        acc = self._batch_scalar_mul(
            self.g2_tpu, msm_tpu.pack_g2_points, scalars, base
        )
        return [
            msm_tpu.unpack_g2_point(
                self.curve_name, {k: v[i] for k, v in acc.items()}
            )
            for i in range(len(scalars))
        ]

    # ------------------------------------------------------------------
    # trusted setup
    # ------------------------------------------------------------------
    def generate_setup(
        self, r1cs: R1CS, rng: Optional[random.Random] = None
    ) -> Groth16KeyPair:
        rng = rng or random.Random()
        r = self.r
        tau = rng.randrange(1, r)
        alpha = rng.randrange(1, r)
        beta = rng.randrange(1, r)
        delta = rng.randrange(1, r)
        delta_inv = pow(delta, r - 2, r)

        num_vars = r1cs.num_variables
        num_pub = r1cs.num_primary + 1
        a_at, b_at, c_at = r1cs.qap_evaluations(tau, r)
        d_size, z_tau = r1cs.domain_vanishing(tau, r)

        abc_scalars = [
            (beta * a_at[i] + alpha * b_at[i] + c_at[i]) % r
            for i in range(num_pub)
        ]
        l_scalars = [
            (beta * a_at[i] + alpha * b_at[i] + c_at[i]) * delta_inv % r
            for i in range(num_pub, num_vars)
        ]
        h_scalars = []
        t_pow = 1
        for _ in range(d_size - 1):
            h_scalars.append(t_pow * z_tau % r * delta_inv % r)
            t_pow = t_pow * tau % r

        g1 = self.batch_mul_g1(
            [alpha, beta, delta]
            + a_at
            + b_at
            + abc_scalars
            + l_scalars
            + h_scalars
        )
        alpha_g1, beta_g1, delta_g1 = g1[0], g1[1], g1[2]
        o = 3
        a_query = g1[o : o + num_vars]
        o += num_vars
        b_g1 = g1[o : o + num_vars]
        o += num_vars
        abc = g1[o : o + num_pub]
        o += num_pub
        l_query = g1[o : o + len(l_scalars)]
        o += len(l_scalars)
        h_query = g1[o:]

        g2 = self.batch_mul_g2([beta, delta] + b_at)
        beta_g2, delta_g2 = g2[0], g2[1]
        b_g2 = g2[2:]

        pk = Groth16ProvingKey(
            alpha_g1=alpha_g1,
            beta_g1=beta_g1,
            beta_g2=beta_g2,
            delta_g1=delta_g1,
            delta_g2=delta_g2,
            a_query=a_query,
            b_g1_query=b_g1,
            b_g2_query=b_g2,
            l_query=l_query,
            h_query=h_query,
        )
        vk = Groth16VerificationKey(
            alpha=alpha_g1, beta=beta_g2, delta=delta_g2, abc=abc
        )
        return Groth16KeyPair(pk=pk, vk=vk)

    # ------------------------------------------------------------------
    # proving
    # ------------------------------------------------------------------
    def h_coefficients_device(self, r1cs: R1CS, assignment: Sequence[int]):
        """H(x) coefficient limbs on device (Montgomery form)."""
        r = self.r
        az, bz, cz = r1cs.abc_evaluations(assignment)
        F = self.Fr
        dev = [F.pack(v) for v in (az, bz, cz)]
        a_c = fft_tpu.fft(dev[0], r, inverse=True)
        b_c = fft_tpu.fft(dev[1], r, inverse=True)
        c_c = fft_tpu.fft(dev[2], r, inverse=True)
        a_e = fft_tpu.coset_fft(a_c, r)
        b_e = fft_tpu.coset_fft(b_c, r)
        c_e = fft_tpu.coset_fft(c_c, r)
        d = domain(r1cs.qap_degree, r)
        zinv = d.vanishing_on_coset_inverse()
        mp = lb.mont_params(r)
        zinv_m = jnp.asarray(
            lb.to_limbs(zinv * mp.r_mod_p % r, F.L).astype(np.int32)
        )
        h_e = F.mont_mul(
            F.sub(F.mont_mul(a_e, b_e), c_e),
            jnp.broadcast_to(zinv_m, a_e.shape),
        )
        return fft_tpu.coset_ifft(h_e, r)

    def prove(
        self,
        r1cs: R1CS,
        pk,
        assignment: Sequence[int],
        rng: Optional[random.Random] = None,
        device_pk: Optional[DevicePk] = None,
    ) -> Groth16Proof:
        rng = rng or random.Random()
        r = self.r
        num_pub = r1cs.num_primary + 1
        dpk = device_pk or pack_pk(self.curve_name, pk, num_pub)

        # H coefficients on device, then unpack scalars for the H MSM
        h_dev = self.h_coefficients_device(r1cs, assignment)
        h_scalars = self.Fr.unpack(h_dev)[: r1cs.qap_degree - 1]

        nbits = r.bit_length()
        asg = [a % r for a in assignment]

        def msm(crv, query, scalars):
            n = query["x"].shape[0]
            assert len(scalars) <= n
            scal = list(scalars) + [0] * (n - len(scalars))
            bits = msm_tpu.scalar_bit_planes(scal, nbits)
            return crv.msm(bits, query)

        ev_a = msm(self.g1_tpu, dpk.a_query, asg)
        ev_b1 = msm(self.g1_tpu, dpk.b_g1_query, asg)
        ev_b2 = msm(self.g2_tpu, dpk.b_g2_query, asg)
        ev_l = msm(self.g1_tpu, dpk.l_query, asg[num_pub:])
        ev_h = msm(self.g1_tpu, dpk.h_query, h_scalars)

        ev_a_h = msm_tpu.unpack_g1_point(self.curve_name, ev_a)
        ev_b1_h = msm_tpu.unpack_g1_point(self.curve_name, ev_b1)
        ev_b2_h = msm_tpu.unpack_g2_point(self.curve_name, ev_b2)
        ev_l_h = msm_tpu.unpack_g1_point(self.curve_name, ev_l)
        ev_h_h = msm_tpu.unpack_g1_point(self.curve_name, ev_h)

        rr = rng.randrange(r)
        ss = rng.randrange(r)
        g1, g2 = self.g1_host, self.g2_host
        A = g1.add(g1.add(dpk.alpha_g1, ev_a_h), g1.mul(rr, dpk.delta_g1))
        B = g2.add(g2.add(dpk.beta_g2, ev_b2_h), g2.mul(ss, dpk.delta_g2))
        B1 = g1.add(g1.add(dpk.beta_g1, ev_b1_h), g1.mul(ss, dpk.delta_g1))
        C = g1.add(
            g1.add(ev_l_h, ev_h_h),
            g1.add(
                g1.add(g1.mul(ss, A), g1.mul(rr, B1)),
                g1.neg(g1.mul(rr * ss % r, dpk.delta_g1)),
            ),
        )
        return Groth16Proof(a=A, b=B, c=C)
