"""In-circuit BLS12-377 pairing: ate Miller loop + final exponentiation,
arithmetized over the BW6-761 scalar field.

This is the hard core of the wrapper circuit (SURVEY.md "hard parts" #1):
the equivalent of libsnark's r1cs_gg_ppzksnark verifier pairing gadgets in
the reference, but designed from the pairing algebra:

  * ate pairing e(P, Q) = f_{x,Q}(P) ^ ((q^12-1)/r), loop scalar x =
    0x8508c00000000001 (64 bits, Hamming weight 7);
  * G2 "precompute" = the doubling/addition chain of Q with per-step line
    coefficients (lambda, c = lambda x_T - y_T).  For verification-key G2
    points the chain is built once and SHARED across all proofs in the
    batch (reference mirrors this with process_verification_key_gadget,
    aggregator_gadget.tcc:27-28); for the constant gamma generator the
    chain is precomputed on the host and enters the circuit as constants
    (zero cost);
  * merged multi-pairing: one shared f-squaring per loop iteration
    accumulates the line evaluations of all pairs in a product, giving
    prod_i e(P_i, Q_i) with a single final exponentiation;
  * final exponentiation via the cube trick: instead of
    h = (q^4 - q^2 + 1)/r we exponentiate by 3h, using the BLS12 identity
    3h = (x-1)^2 (x+q) (x^2 + q^2 - 1) + 3 (checked numerically below).
    Cubing is injective on the order-r target group, so "product == 1"
    semantics are preserved.

Line evaluation (D-type twist, untwist psi(x,y) = (x w^2, y w^3), w^2 = v):
  l(P) = y_P - (lambda x_P) w + (lambda x_T - y_T) w^3
       = ((y_P, 0, 0), (-lambda x_P, lambda x_T - y_T, 0))   as Fq6 pairs.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

from ..ec import host_curve as hc
from ..ff import host_field as hf
from ..ff import params as P
from .curve_ops import CurveGadget
from .field_ext import GadgetExt, GadgetFp
from .protoboard import LC, Protoboard

ATE_LOOP = P.BLS12_377_X  # positive for BLS12-377
ATE_BITS = bin(ATE_LOOP)[2:]

# --- numeric sanity for the final-exp decomposition (runs at import) -------
_q = P.BLS12_377_Q
_r = P.BLS12_377_R
_x = P.BLS12_377_X
assert (_q**4 - _q**2 + 1) % _r == 0
_HARD = 3 * ((_q**4 - _q**2 + 1) // _r)
assert _HARD == (_x - 1) ** 2 * (_x + _q) * (_x**2 + _q**2 - 1) + 3, (
    "BLS12 final-exp decomposition identity failed"
)


@dataclasses.dataclass
class LineCoeffs:
    """One Miller-loop step: is_add, lambda (Fq2 gadget elem), and
    c = lambda * x_T - y_T (Fq2 gadget elem)."""

    is_add: bool
    lam: object
    c: object


class BLS12PairingGadget:
    def __init__(self, pb: Protoboard, towers: dict):
        self.pb = pb
        self.fq: GadgetFp = towers["fq"]
        self.fq2: GadgetExt = towers["fq2"]
        self.fq6: GadgetExt = towers["fq6"]
        self.fq12: GadgetExt = towers["fq12"]
        host_g2 = hc.g2_curve("bls12-377")
        self.host_g2 = host_g2
        self.g2_gadget = CurveGadget(self.fq2, host_g2.a, host_g2.b)
        self.host_fq2 = hf.towers("bls12-377")["fq2"]

    # ------------------------------------------------------------------
    # G2 precompute (variable Q)
    # ------------------------------------------------------------------
    def g2_precompute(self, q_pt) -> List[LineCoeffs]:
        """Doubling/addition chain of Q with line coefficients (in-circuit).

        Cost ~ 64 G2 doublings + 7 additions; shared across the batch for
        verification-key points.
        """
        F2 = self.fq2
        g = self.g2_gadget
        coeffs: List[LineCoeffs] = []
        T = q_pt
        for bit in ATE_BITS[1:]:
            # tangent at T
            xt, yt = T
            xx = F2.sqr(xt)
            lam = g._div(F2.add(F2.add(xx, xx), xx), F2.add(yt, yt))
            c = F2.sub(F2.mul(lam, xt), yt)
            coeffs.append(LineCoeffs(False, lam, c))
            lam2 = F2.sqr(lam)
            x3 = F2.sub(lam2, F2.add(xt, xt))
            y3 = F2.sub(F2.mul(lam, F2.sub(xt, x3)), yt)
            T = (x3, y3)
            if bit == "1":
                xt, yt = T
                xq, yq = q_pt
                lam = g._div(F2.sub(yq, yt), F2.sub(xq, xt))
                c = F2.sub(F2.mul(lam, xt), yt)
                coeffs.append(LineCoeffs(True, lam, c))
                lam2 = F2.sqr(lam)
                x3 = F2.sub(F2.sub(lam2, xt), xq)
                y3 = F2.sub(F2.mul(lam, F2.sub(xt, x3)), yt)
                T = (x3, y3)
        return coeffs

    # ------------------------------------------------------------------
    # G2 precompute (constant Q) -- zero constraints
    # ------------------------------------------------------------------
    def g2_precompute_const(self, host_q) -> List[LineCoeffs]:
        H2 = self.host_fq2
        crv = self.host_g2
        coeffs: List[LineCoeffs] = []
        T = host_q
        for bit in ATE_BITS[1:]:
            xt, yt = T
            xx = H2.sqr(xt)
            lam = H2.mul(
                H2.add(H2.add(xx, xx), xx), H2.inv(H2.add(yt, yt))
            )
            c = H2.sub(H2.mul(lam, xt), yt)
            coeffs.append(
                LineCoeffs(False, self.fq2.constant(lam), self.fq2.constant(c))
            )
            T = crv.dbl(T)
            if bit == "1":
                xt, yt = T
                xq, yq = host_q
                lam = H2.mul(H2.sub(yq, yt), H2.inv(H2.sub(xq, xt)))
                c = H2.sub(H2.mul(lam, xt), yt)
                coeffs.append(
                    LineCoeffs(
                        True, self.fq2.constant(lam), self.fq2.constant(c)
                    )
                )
            T = crv.add(T, host_q) if bit == "1" else T
        return coeffs

    # ------------------------------------------------------------------
    # Miller loop (merged multi-pairing)
    # ------------------------------------------------------------------
    def _line_fq12(self, coeff: LineCoeffs, p_pt) -> object:
        """Build l(P) as a full Fq12 element (3 sparse Fq2 slots)."""
        F2, pb = self.fq2, self.pb
        xp, yp = p_pt  # base-field LCs
        # -lambda * x_P : variable base-field scalar times Fq2 element
        lam_xp = tuple(pb.mul(comp, xp) for comp in coeff.lam)
        neg_lam_xp = F2.neg(lam_xp)
        c0 = (yp, LC())  # y_P embedded in Fq2
        zero2 = F2.zero()
        a6 = (c0, zero2, zero2)  # Fq6: y_P
        b6 = (neg_lam_xp, coeff.c, zero2)  # Fq6: -lam x_P + c v
        return (a6, b6)

    def multi_miller(
        self,
        pairs: Sequence[Tuple[List[LineCoeffs], Tuple[LC, LC]]],
    ) -> object:
        """prod_i f_{x, Q_i}(P_i) with one shared squaring per iteration.

        ``pairs``: (precomputed line chain for Q_i, G1 point P_i as LC pair).
        """
        F12 = self.fq12
        f = F12.one()
        idx = 0
        first = True
        for bit in ATE_BITS[1:]:
            if not first:
                f = F12.sqr(f)
            for chain, p_pt in pairs:
                coeff = chain[idx]
                assert not coeff.is_add
                f = self._mul_by_line(f, self._line_fq12(coeff, p_pt))
            idx += 1
            if bit == "1":
                for chain, p_pt in pairs:
                    coeff = chain[idx]
                    assert coeff.is_add
                    f = self._mul_by_line(f, self._line_fq12(coeff, p_pt))
                idx += 1
            first = False
        return f

    def _mul6_sparse01(self, x6, b0, b1):
        """Fq6 * (b0 + b1 v): 5 Fq2 muls (vs 6 for the full Karatsuba).

        (x0 + x1 v + x2 v^2)(b0 + b1 v) with v^3 = nr:
          c0 = x0 b0 + nr x2 b1;  c1 = x0 b1 + x1 b0;  c2 = x1 b1 + x2 b0.
        """
        F2, F6 = self.fq2, self.fq6
        x0, x1, x2 = x6
        t0 = F2.mul(x0, b0)
        t1 = F2.mul(x1, b1)
        s01 = F2.sub(
            F2.sub(F2.mul(F2.add(x0, x1), F2.add(b0, b1)), t0), t1
        )
        t20 = F2.mul(x2, b0)
        t21 = F2.mul(x2, b1)
        c0 = F2.add(t0, F6._mul_nr_base(t21))
        c2 = F2.add(t1, t20)
        return (c0, s01, c2)

    def _mul6_by_base(self, x6, s):
        """Fq6 * (base-field scalar s embedded at slot 0): 6 base muls."""
        pb = self.pb
        return tuple(
            tuple(pb.mul(comp, s) for comp in fq2c) for fq2c in x6
        )

    def _mul_by_line(self, f, line) -> object:
        """f * l exploiting the line's sparsity (VERDICT round-1 item 8).

        l = (A, B) over Fq12 = Fq6[w]/(w^2 - v) with A = (y_P, 0, 0)
        (y_P a BASE-field value embedded in Fq2 slot 0) and B = (B0, B1, 0).
        Karatsuba on the top level with sparse inner products:
          f0*A = 6 base muls; f1*B and (f0+f1)(A+B) = 5 Fq2 muls each
        -> 36 base-field multiplications per line mul (vs 54 for the full
        Fq12 Karatsuba; reference analog: libsnark's sparse e-over-e
        multiplication in the verifier gadgets,
        groth16_verifier_parameters.hpp:20-31).
        """
        F2, F6, F12 = self.fq2, self.fq6, self.fq12
        a6, b6 = line
        # structural sparsity contract of _line_fq12
        yp = a6[0][0]
        assert not a6[0][1].terms and not any(
            c.terms for fq2c in a6[1:] for c in fq2c
        ), "line A-half must be (y_P, 0, 0)"
        assert not any(c.terms for c in b6[2]), "line B-half must be (*,*,0)"
        f0, f1 = f
        f0A = self._mul6_by_base(f0, yp)
        f1B = self._mul6_sparse01(f1, b6[0], b6[1])
        fs = self._mul6_sparse01(
            F6.add(f0, f1), F2.add(a6[0], b6[0]), b6[1]
        )
        c1 = F6.sub(F6.sub(fs, f0A), f1B)
        c0 = F6.add(f0A, F12._mul_nr_base(f1B))
        return (c0, c1)

    # ------------------------------------------------------------------
    # Final exponentiation
    # ------------------------------------------------------------------
    def pow_by_const(self, m, e: int):
        F12 = self.fq12
        acc = m
        for bit in bin(e)[3:]:
            acc = F12.sqr(acc)
            if bit == "1":
                acc = F12.mul(acc, m)
        return acc

    def final_exponentiation(self, f):
        """f ^ (3 (q^12 - 1)/r): easy part then cubed hard part."""
        F12 = self.fq12
        # easy: m = (conj(f) / f^{-1}) ... m = f^(q^6 - 1), then ^(q^2 + 1)
        f_inv = F12.inv(f)
        m1 = F12.mul(F12.frobenius(f, 6), f_inv)  # f^(q^6-1)
        m = F12.mul(F12.frobenius(m1, 2), m1)  # ^(q^2+1); now cyclotomic
        # hard (cubed): m^((x-1)^2 (x+q) (x^2+q^2-1) + 3)
        a = self.pow_by_const(m, _x - 1)
        a = self.pow_by_const(a, _x - 1)  # m^((x-1)^2)
        b = F12.mul(self.pow_by_const(a, _x), F12.frobenius(a, 1))  # ^(x+q)
        bx = self.pow_by_const(b, _x)
        bxx = self.pow_by_const(bx, _x)  # b^(x^2)
        # b^(x^2 + q^2 - 1) = b^(x^2) * frob^2(b) * conj(b)
        c = F12.mul(F12.mul(bxx, F12.frobenius(b, 2)), F12.frobenius(b, 6))
        m3 = F12.mul(F12.sqr(m), m)
        return F12.mul(c, m3)

    # ------------------------------------------------------------------
    def pairing_product_result(self, pairs) -> object:
        """(prod e(P_i, Q_i))^3 as an Fq12 gadget element."""
        return self.final_exponentiation(self.multi_miller(pairs))

    def is_one_bit(self, f) -> LC:
        return self.fq12.is_equal_bit(f, self.fq12.one())
