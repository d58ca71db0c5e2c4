"""Host-side (pure Python) pairings for all supported curves.

We use the *Tate* pairing ``e(P, Q) = f_{r,P}(psi(Q)) ^ ((q^k - 1) / r)``
with the Miller loop running over the G1 point ``P`` (cheap base-field
point arithmetic) and line functions evaluated at the untwisted G2 point
``psi(Q)`` in the full extension field ``Fq^k``.

This choice trades Miller-loop length for simplicity: it is uniformly
correct for every curve family we support (BLS12, BW6, MNT4, MNT6) without
per-curve optimal-ate loop parameters, and it is only used on the host
control path (Groth16 verification, witness generation oracle).  Vertical
lines are omitted: for all our curves the untwisted x-coordinate lies in a
proper subfield killed by the final exponentiation (denominator
elimination).

The reference obtains pairings from libff (SURVEY.md section 2b); nothing
here is derived from that code.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple

from ..ec import host_curve as hc
from ..ff import host_field as hf
from ..ff import params as P


class PairingContext:
    """Precomputed pairing data for one curve."""

    def __init__(self, curve_name: str):
        self.curve_name = curve_name
        self.params = P.CURVES[curve_name]
        self.towers = hf.towers(curve_name)
        self.fq = self.towers["fq"]
        self.fqk = self.towers["fqk"]
        self.g1 = hc.g1_curve(curve_name)
        self.g2 = hc.g2_curve(curve_name)
        self.r = self.params.r
        self.q = self.params.q
        k = self.params.embedding_degree
        assert self.fqk.degree == k
        self.final_exp_exponent = (self.q**k - 1) // self.r

        fqk = self.fqk
        w = fqk.gen()
        # Twisting element c: E(Fq^k) -> E' maps (x, y) -> (x c^2, y c^3).
        if curve_name == "bls12-377":
            c = fqk.inv(w)  # D-type twist
        else:
            c = w  # M-type twists (BW6) / twists by w (MNT)
        c2 = fqk.sqr(c)
        self._untwist_x = fqk.inv(c2)
        self._untwist_y = fqk.inv(fqk.mul(c2, c))
        # E(Fq^k) curve coefficients (embedded base-field a, b)
        self._ak = fqk.embed(self.params.a)
        self._bk = fqk.embed(
            self.params.b if isinstance(self.params.b, int) else 0
        )

    # -- embeddings ---------------------------------------------------------
    def embed_fg2(self, a):
        """Embed an element of the G2 coordinate field into Fq^k."""
        name = self.curve_name
        t = self.towers
        if name == "bls12-377":
            return t["fq12"].from_base(t["fq6"].from_base(a))
        if name == "bw6-761":
            return t["fq6"].from_base(t["fq3"].from_base(a))
        if name == "mnt4-298":
            return t["fq4"].from_base(a)
        if name == "mnt6-298":
            return t["fq6"].from_base(a)
        raise KeyError(name)

    def untwist(self, q_pt) -> Tuple[Any, Any]:
        """Map a G2 point (twisted coords) onto E(Fq^k)."""
        fqk = self.fqk
        x = fqk.mul(self.embed_fg2(q_pt[0]), self._untwist_x)
        y = fqk.mul(self.embed_fg2(q_pt[1]), self._untwist_y)
        return (x, y)

    def untwisted_on_curve(self, xy) -> bool:
        fqk = self.fqk
        x, y = xy
        rhs = fqk.add(
            fqk.add(fqk.mul(fqk.sqr(x), x), fqk.mul(self._ak, x)), self._bk
        )
        return fqk.eq(fqk.sqr(y), rhs)

    # -- Miller loop --------------------------------------------------------
    def miller_tate(self, p_pt, q_untwisted):
        """f_{r,P}(Q~) without final exponentiation.

        ``p_pt`` is an affine G1 point over Fq; ``q_untwisted`` the untwisted
        G2 point over Fq^k.  Verticals omitted (denominator elimination).
        """
        fq, fqk = self.fq, self.fqk
        xq, yq = q_untwisted
        a = self.g1.a

        f = fqk.one()
        T = p_pt
        # standard left-to-right double-and-add over bits of r below the MSB
        for bit in bin(self.r)[3:]:
            # line through T, T (tangent)
            xt, yt = T
            lam = fq.mul(
                fq.add(fq.mul_scalar(fq.sqr(xt), 3), a),
                fq.inv(fq.add(yt, yt)),
            )
            # l(Q) = (yQ - yt) - lam * (xQ - xt)
            l = fqk.sub(
                fqk.sub(yq, fqk.embed(yt)),
                fqk.mul(fqk.sub(xq, fqk.embed(xt)), fqk.embed(lam)),
            )
            f = fqk.mul(fqk.sqr(f), l)
            T = self.g1.dbl(T)
            if bit == "1":
                xt, yt = T
                x1, y1 = p_pt
                if fq.eq(xt, x1):
                    # T == +-P; the chord is vertical -> omitted
                    T = self.g1.add(T, p_pt)
                    continue
                lam = fq.mul(fq.sub(y1, yt), fq.inv(fq.sub(x1, xt)))
                l = fqk.sub(
                    fqk.sub(yq, fqk.embed(yt)),
                    fqk.mul(fqk.sub(xq, fqk.embed(xt)), fqk.embed(lam)),
                )
                f = fqk.mul(f, l)
                T = self.g1.add(T, p_pt)
        return f

    def final_exp(self, f):
        return self.fqk.pow(f, self.final_exp_exponent)

    # -- public API ---------------------------------------------------------
    def pairing(self, p_pt, q_pt):
        """Full Tate pairing e(P, Q) with P in G1, Q in G2 (twisted)."""
        if p_pt is None or q_pt is None:
            return self.fqk.one()
        return self.final_exp(self.miller_tate(p_pt, self.untwist(q_pt)))

    def pairing_product(self, pairs: Sequence[Tuple[Any, Any]]):
        """prod_i e(P_i, Q_i) with a single shared final exponentiation."""
        fqk = self.fqk
        f = fqk.one()
        for p_pt, q_pt in pairs:
            if p_pt is None or q_pt is None:
                continue
            f = fqk.mul(f, self.miller_tate(p_pt, self.untwist(q_pt)))
        return self.final_exp(f)

    def pairing_product_is_one(self, pairs) -> bool:
        return self.fqk.eq(self.pairing_product(pairs), self.fqk.one())


@functools.lru_cache(maxsize=None)
def ctx(curve_name: str) -> PairingContext:
    return PairingContext(curve_name)
