"""In-circuit affine elliptic-curve operations over gadget fields.

Affine coordinates are R1CS-optimal (division costs the same as
multiplication), so all point gadgets here are affine with explicit slope
variables — the same design space libsnark's G1/G2 variable gadgets occupy
in the reference (SURVEY.md section 2b, "libsnark — verifier gadgets").

Degenerate cases (doubling a 2-torsion point, adding P to ±P, the point at
infinity) are outside the honest-witness distribution; an adversarially
crafted nested proof could make the wrapper witness unsatisfiable, exactly
as in the reference's affine gadgets.  Points at infinity are excluded at
deserialization time by the service layer.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from .protoboard import LC, Protoboard

# A gadget point is a pair (x, y) of gadget-field elements over field F.
GPoint = Tuple[object, object]


class CurveGadget:
    """Affine ops on y^2 = x^3 + a x + b over gadget field ``F``.

    ``a_const``/``b_const`` are HOST elements of the matching host field.
    """

    def __init__(self, F, a_const, b_const):
        self.F = F
        self.pb = F.pb
        self.a = a_const
        self.b = b_const

    # -- helpers ------------------------------------------------------------
    def _mul_a(self, x):
        """a * x (a constant; free)."""
        F = self.F
        if getattr(F, "degree", 1) == 1:
            return F.mul_constant(x, self.a)
        return F.mul_constant(x, self.a)

    def _div(self, num, den):
        """Allocate lam with constraint lam * den == num."""
        F = self.F
        if getattr(F, "degree", 1) == 1:
            return self.pb.div(num, den)
        lam = F.alloc()
        # witness hook: lam = num / den (host division, 0 if den == 0)
        pb = self.pb
        num_lcs = F.to_lcs(num)
        den_lcs = F.to_lcs(den)
        lam_idxs = [lc.terms[0][0] for lc in F.to_lcs(lam)]
        host = F.host

        def fn(w, _n=num_lcs, _d=den_lcs, _l=lam_idxs, _pb=pb, _h=host):
            nv = _h.from_list([_pb.lc_val(w, lc) for lc in _n])
            dv = _h.from_list([_pb.lc_val(w, lc) for lc in _d])
            if _h.is_zero(dv):
                flat = [0] * len(_l)
            else:
                flat = _h.to_list(_h.mul(nv, _h.inv(dv)))
            for idx, v in zip(_l, flat):
                w[idx] = v

        pb.add_hook(fn)
        F.enforce_equal(F.mul(lam, den), num)
        return lam

    # -- point ops ----------------------------------------------------------
    def dbl(self, p: GPoint) -> GPoint:
        """2P; constraints: lam (2y) == 3x^2 + a;  x3 = lam^2 - 2x;
        y3 = lam (x - x3) - y."""
        F = self.F
        x, y = p
        xx = F.sqr(x)
        num = F.add(F.add(F.add(xx, xx), xx), self._a_elem())
        lam = self._div(num, F.add(y, y))
        lam2 = F.sqr(lam)
        x3 = F.sub(lam2, F.add(x, x))
        y3 = F.sub(F.mul(lam, F.sub(x, x3)), y)
        return (x3, y3)

    def _a_elem(self):
        F = self.F
        if getattr(F, "degree", 1) == 1:
            return F.constant(self.a)
        return F.constant(self.a)

    def add_unequal(self, p: GPoint, q: GPoint) -> GPoint:
        """P + Q assuming x_P != x_Q (generic case)."""
        F = self.F
        x1, y1 = p
        x2, y2 = q
        lam = self._div(F.sub(y2, y1), F.sub(x2, x1))
        lam2 = F.sqr(lam)
        x3 = F.sub(F.sub(lam2, x1), x2)
        y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
        return (x3, y3)

    def neg(self, p: GPoint) -> GPoint:
        return (p[0], self.F.neg(p[1]))

    def select(self, bit: LC, if_one: GPoint, if_zero: GPoint) -> GPoint:
        F = self.F
        if getattr(F, "degree", 1) == 1:
            return (
                self.pb.select(bit, if_one[0], if_zero[0]),
                self.pb.select(bit, if_one[1], if_zero[1]),
            )
        return (
            F.select(bit, if_one[0], if_zero[0]),
            F.select(bit, if_one[1], if_zero[1]),
        )

    def conditional_add(self, acc: GPoint, p: GPoint, bit: LC) -> GPoint:
        added = self.add_unequal(acc, p)
        return self.select(bit, added, acc)

    def enforce_on_curve(self, p: GPoint) -> None:
        F = self.F
        x, y = p
        rhs = F.add(
            F.add(F.mul(F.sqr(x), x), F.mul_constant(x, self.a) if getattr(F, "degree", 1) > 1 else x.scale(self.a)),
            self._b_elem(),
        )
        F.enforce_equal(F.sqr(y), rhs) if getattr(F, "degree", 1) > 1 else self.pb.enforce_equal(self.pb.square(y), rhs)

    def _b_elem(self):
        F = self.F
        if getattr(F, "degree", 1) == 1:
            return F.constant(self.b)
        return F.constant(self.b)

    # -- scalar multiplication / MSM with dummy-offset trick -----------------
    def msm_with_offset(
        self,
        points: Sequence[GPoint],
        bit_lists: Sequence[List[LC]],
        offset_host_pt,
        offset_final_host_pt,
    ) -> GPoint:
        """sum_j (bits_j) * P_j  via shared-doubling (Straus) with a constant
        offset point D keeping every intermediate off infinity:

          acc = D; for i = MSB..0: acc = 2 acc + sum_j bit_{j,i} P_j
          result = acc - 2^n D   (precomputed constant)

        ``offset_host_pt`` is D as a host affine point; ``offset_final_host_pt``
        is 2^n D (n = bit length), both over the host field of F.
        """
        F = self.F
        n = max(len(b) for b in bit_lists)
        acc = self.constant_point(offset_host_pt)
        for i in range(n - 1, -1, -1):
            acc = self.dbl(acc)
            for pt, bits in zip(points, bit_lists):
                if i < len(bits):
                    acc = self.conditional_add(acc, pt, bits[i])
        neg_off = (offset_final_host_pt[0], self._host_neg(offset_final_host_pt[1]))
        return self.add_unequal(acc, self.constant_point(neg_off))

    def _host_neg(self, y):
        F = self.F
        host = F.host if getattr(F, "degree", 1) > 1 else F.host
        return host.neg(y)

    def constant_point(self, host_pt) -> GPoint:
        F = self.F
        if getattr(F, "degree", 1) == 1:
            return (LC.const(host_pt[0]), LC.const(host_pt[1]))
        return (F.constant(host_pt[0]), F.constant(host_pt[1]))

    def value(self, w, p: GPoint):
        """Evaluate a gadget point to host affine coords."""
        F = self.F
        if getattr(F, "degree", 1) == 1:
            return (self.pb.lc_val(w, p[0]), self.pb.lc_val(w, p[1]))
        return (F.value(w, p[0]), F.value(w, p[1]))

    def alloc_point(self) -> GPoint:
        F = self.F
        if getattr(F, "degree", 1) == 1:
            return (F.alloc(), F.alloc())
        return (F.alloc(), F.alloc())

    def set_point_witness(self, w, gp: GPoint, host_pt) -> None:
        """Assign a host affine point into allocated point vars."""
        F = self.F
        if getattr(F, "degree", 1) == 1:
            for lc, v in zip((gp[0], gp[1]), host_pt):
                w[lc.terms[0][0]] = v % self.pb.r
        else:
            for lc, v in zip(F.to_lcs(gp[0]), F.host.to_list(host_pt[0])):
                w[lc.terms[0][0]] = v
            for lc, v in zip(F.to_lcs(gp[1]), F.host.to_list(host_pt[1])):
                w[lc.terms[0][0]] = v
