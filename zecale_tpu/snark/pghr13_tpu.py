"""PGHR13 prover/setup on the JAX/TPU compute path.

Same algebra as the host oracle (zecale_tpu/snark/pghr13.py) with the bulk
work on device, mirroring the Groth16 TPU backend (groth16_tpu.py):

  * QAP witness reduction (iFFT -> coset FFT -> pointwise -> coset iFFT)
    plus the A(x)/B(x) coefficient vectors needed for the ZK shift, via
    zecale_tpu.poly.fft_tpu.qap_polys_pipeline_jit;
  * the eight proof MSMs (A, A', B in G2, B', C, C', K, H) via the batched
    Jacobian kernels;
  * trusted setup via batched fixed-base scalar multiplication.

This is the capability the reference gets from ZECALE_SNARK=PGHR13 builds
(libsnark r1cs_ppzksnark via libzeth pghr13_snark, CMakeLists.txt:31-57) —
here it is a runtime-selectable wrapper-snark backend.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Optional, Sequence

from ..ec import host_curve as hc
from ..ec import msm_tpu
from ..poly import fft_tpu
from .groth16_tpu import TpuSnarkBase, _next_pow2
from .pghr13 import (
    Pghr13KeyPair,
    Pghr13Proof,
    Pghr13ProvingKey,
    Pghr13VerificationKey,
)
from .r1cs import R1CS


@dataclasses.dataclass
class DevicePkPghr13:
    """PGHR13 proving key resident on device (points packed, Montgomery)."""

    curve_name: str
    a0: dict  # [rhoA At_priv]1
    a1: dict  # [alphaA rhoA At_priv]1
    b0: dict  # [rhoB Bt]2
    b1: dict  # [alphaB rhoB Bt]1
    c0: dict  # [rhoC Ct]1
    c1: dict  # [alphaC rhoC Ct]1
    k: dict  # [beta(...)]1
    h: dict  # [t^i]1


def pack_pk_pghr13(curve_name: str, pk: Pghr13ProvingKey) -> DevicePkPghr13:
    """Pack to device, padding every G1 query to one common power-of-two
    length so all seven G1 MSMs share a single compiled kernel."""
    n_g1 = _next_pow2(max(len(pk.a_query), len(pk.h_query)))
    n_g2 = _next_pow2(len(pk.b_query))

    def pad(q, n):
        return list(q) + [None] * (n - len(q))

    pg1 = lambda pts: msm_tpu.pack_g1_points(curve_name, pad(pts, n_g1))  # noqa: E731
    return DevicePkPghr13(
        curve_name=curve_name,
        a0=pg1([q[0] for q in pk.a_query]),
        a1=pg1([q[1] for q in pk.a_query]),
        b0=msm_tpu.pack_g2_points(
            curve_name, pad([q[0] for q in pk.b_query], n_g2)
        ),
        b1=pg1([q[1] for q in pk.b_query]),
        c0=pg1([q[0] for q in pk.c_query]),
        c1=pg1([q[1] for q in pk.c_query]),
        k=pg1(pk.k_query),
        h=pg1(pk.h_query),
    )


class Pghr13TPU(TpuSnarkBase):
    """TPU-path PGHR13 over the named curve."""

    name = "PGHR13"

    # ------------------------------------------------------------------
    # trusted setup
    # ------------------------------------------------------------------
    def generate_setup(
        self, r1cs: R1CS, rng: Optional[random.Random] = None
    ) -> Pghr13KeyPair:
        rng = rng or random.Random()
        r = self.r
        t = rng.randrange(1, r)
        alphaA = rng.randrange(1, r)
        alphaB = rng.randrange(1, r)
        alphaC = rng.randrange(1, r)
        rhoA = rng.randrange(1, r)
        rhoB = rng.randrange(1, r)
        beta = rng.randrange(1, r)
        gamma = rng.randrange(1, r)
        rhoC = rhoA * rhoB % r

        num_pub = r1cs.num_primary + 1
        a_at, b_at, c_at = r1cs.qap_evaluations(t, r)
        d_size, z_t = r1cs.domain_vanishing(t, r)

        At = list(a_at) + [z_t, 0, 0]
        Bt = list(b_at) + [0, z_t, 0]
        Ct = list(c_at) + [0, 0, z_t]
        m = len(At)

        ic = [rhoA * At[i] % r for i in range(num_pub)]
        At_priv = list(At)
        for i in range(num_pub):
            At_priv[i] = 0

        a0_s = [rhoA * At_priv[i] % r for i in range(m)]
        a1_s = [alphaA * v % r for v in a0_s]
        b0_s = [rhoB * Bt[i] % r for i in range(m)]
        b1_s = [alphaB * v % r for v in b0_s]
        c0_s = [rhoC * Ct[i] % r for i in range(m)]
        c1_s = [alphaC * v % r for v in c0_s]
        k_s = [
            beta * (rhoA * At[i] + rhoB * Bt[i] + rhoC * Ct[i]) % r
            for i in range(m)
        ]
        h_s = [pow(t, i, r) for i in range(d_size + 1)]

        g1 = self.batch_mul_g1(
            [alphaB, gamma * beta % r]
            + a0_s + a1_s + b1_s + c0_s + c1_s + k_s + h_s + ic
        )
        alphaB_g1, gb1 = g1[0], g1[1]
        o = 2
        cuts = [m, m, m, m, m, m, d_size + 1, num_pub]
        parts = []
        for n in cuts:
            parts.append(g1[o : o + n])
            o += n
        a0_q, a1_q, b1_q, c0_q, c1_q, k_q, h_q, ic_q = parts

        g2 = self.batch_mul_g2(
            [alphaA, alphaC, gamma, gamma * beta % r, rhoC * z_t % r] + b0_s
        )
        alphaA_g2, alphaC_g2, gamma_g2, gb2, z_g2 = g2[:5]
        b0_q = g2[5:]

        pk = Pghr13ProvingKey(
            a_query=list(zip(a0_q, a1_q)),
            b_query=list(zip(b0_q, b1_q)),
            c_query=list(zip(c0_q, c1_q)),
            k_query=k_q,
            h_query=h_q,
        )
        vk = Pghr13VerificationKey(
            a=alphaA_g2, b=alphaB_g1, c=alphaC_g2, g=gamma_g2,
            gb1=gb1, gb2=gb2, z=z_g2, ic=ic_q,
        )
        return Pghr13KeyPair(pk=pk, vk=vk)

    # ------------------------------------------------------------------
    # proving
    # ------------------------------------------------------------------
    def prove(
        self,
        r1cs: R1CS,
        pk: Pghr13ProvingKey,
        assignment: Sequence[int],
        rng: Optional[random.Random] = None,
        device_pk: Optional[DevicePkPghr13] = None,
    ) -> Pghr13Proof:
        rng = rng or random.Random()
        r = self.r
        dpk = device_pk or pack_pk_pghr13(self.curve_name, pk)
        d1, d2, d3 = (rng.randrange(r) for _ in range(3))

        # QAP polynomials on device
        from .groth16_tpu import _abc_evaluations_fast

        az, bz, cz = _abc_evaluations_fast(r1cs, assignment)
        F = self.Fr
        h_dev, a_dev, b_dev = fft_tpu.qap_polys_pipeline_jit(
            r1cs.qap_degree, r
        )(F.pack(az), F.pack(bz), F.pack(cz))
        h = F.unpack(h_dev)
        a_poly = F.unpack(a_dev)
        b_poly = F.unpack(b_dev)

        # ZK shift: H'(x) = H + d2 A + d1 B + d1 d2 Z - d3
        n = r1cs.qap_degree
        hp = [0] * (n + 1)
        for i in range(n):
            hp[i] = (h[i] + d2 * a_poly[i] + d1 * b_poly[i]) % r
        hp[0] = (hp[0] - d1 * d2 - d3) % r
        hp[n] = (hp[n] + d1 * d2) % r

        coeffs = [a % r for a in assignment] + [d1, d2, d3]

        A = self.msm_device(False, dpk.a0, coeffs)
        Ap = self.msm_device(False, dpk.a1, coeffs)
        B = self.msm_device(True, dpk.b0, coeffs)
        Bp = self.msm_device(False, dpk.b1, coeffs)
        C = self.msm_device(False, dpk.c0, coeffs)
        Cp = self.msm_device(False, dpk.c1, coeffs)
        K = self.msm_device(False, dpk.k, coeffs)
        H = self.msm_device(False, dpk.h, hp)

        up1 = lambda p: msm_tpu.unpack_g1_point(self.curve_name, p)  # noqa: E731
        return Pghr13Proof(
            a=up1(A), a_p=up1(Ap),
            b=msm_tpu.unpack_g2_point(self.curve_name, B), b_p=up1(Bp),
            c=up1(C), c_p=up1(Cp), h=up1(H), k=up1(K),
        )

    # ------------------------------------------------------------------
    def verify(self, inputs, proof, vk) -> bool:
        """Host verification (5 pairing checks); device verify is not on the
        hot path for the wrapper snark."""
        from .pghr13 import Pghr13

        return Pghr13(self.curve_name).verify(inputs, proof, vk)
