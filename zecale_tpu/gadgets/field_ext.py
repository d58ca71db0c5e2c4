"""In-circuit extension-field arithmetic (tower gadgets).

Circuit-level mirror of ``zecale_tpu.ff.host_field``: elements of
Fq2/Fq3/Fq6/Fq12 are nested tuples of ``LC``s over the circuit's native
scalar field, and every *multiplication* allocates intermediate variables
via Karatsuba (constraint count == number of base-field multiplications).
Linear maps (add/sub/scalar-mul/Frobenius/conjugation) are free: they only
rewire linear combinations.

This is the machinery the reference gets from libsnark's Fp2/Fp4/Fp6/Fp12
gadget headers (SURVEY.md section 2b, "libsnark — verifier gadgets"),
re-derived from the tower algebra rather than ported.
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence, Tuple

from ..ff import host_field as hf
from .protoboard import LC, Protoboard

GElem = Any  # LC | tuple of GElem

# global Frobenius-matrix cache: (host field id, prime, degree) -> {power: cols}
_FROB_CACHE: dict = {}


class GadgetFp:
    """The circuit-native scalar field as the bottom of the gadget tower."""

    def __init__(self, pb: Protoboard, host: hf.PrimeField):
        self.pb = pb
        self.host = host
        self.k = 1
        self.degree = 1

    def zero(self) -> LC:
        return LC()

    def one(self) -> LC:
        return self.pb.ONE

    def constant(self, v: int) -> LC:
        return LC.const(v % self.host.p)

    def add(self, a: LC, b: LC) -> LC:
        return a + b

    def sub(self, a: LC, b: LC) -> LC:
        return a - b

    def neg(self, a: LC) -> LC:
        return -a

    def mul(self, a: LC, b: LC) -> LC:
        return self.pb.mul(a, b)

    def sqr(self, a: LC) -> LC:
        return self.pb.square(a)

    def mul_scalar(self, a: LC, k: int) -> LC:
        return a.scale(k % self.host.p)

    def mul_constant(self, a: LC, c: int) -> LC:
        return a.scale(c % self.host.p)

    # host-value plumbing
    def to_lcs(self, a: LC) -> List[LC]:
        return [a]

    def from_lcs(self, lcs: Sequence[LC]):
        assert len(lcs) == 1
        return lcs[0]

    def alloc(self) -> LC:
        return LC.of_var(self.pb.allocate())


class GadgetExt:
    """Binomial extension gadget field base[x]/(x^k - nr), k in {2, 3}.

    ``host`` is the matching host-field context (same nr), used for witness
    hooks (inversion) and for Frobenius constant derivation.
    """

    def __init__(self, base, k: int, nr_host, host: hf.BinomialExt):
        assert k in (2, 3)
        self.base = base
        self.pb = base.pb
        self.k = k
        self.host = host
        self.nr_host = nr_host  # host element of base field
        self.degree = base.degree * k

    # -- constants ----------------------------------------------------------
    def zero(self):
        return tuple(self.base.zero() for _ in range(self.k))

    def one(self):
        return (self.base.one(),) + tuple(
            self.base.zero() for _ in range(self.k - 1)
        )

    def constant(self, host_val):
        """Embed a host-field value of THIS field as a constant element."""
        return tuple(
            self.base.constant(c) for c in host_val
        )

    def from_base(self, a):
        return (a,) + tuple(self.base.zero() for _ in range(self.k - 1))

    # -- linear ops (free) --------------------------------------------------
    def add(self, a, b):
        return tuple(self.base.add(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        return tuple(self.base.sub(x, y) for x, y in zip(a, b))

    def neg(self, a):
        return tuple(self.base.neg(x) for x in a)

    def mul_scalar(self, a, kk: int):
        return tuple(self.base.mul_scalar(x, kk) for x in a)

    def _mul_nr(self, x):
        """Multiply a base-field gadget element by the non-residue (linear)."""
        return self.base.mul_constant(x, self.nr_host)

    def mul_constant(self, a, c_host):
        """Multiply by a CONSTANT host element of this field (linear, free).

        Implemented by expanding the multiplication matrix of c over the
        flattened coordinates.
        """
        lcs = self.to_lcs(a)
        n = self.degree
        # column images: c * basis_j, computed on host
        out = [LC() for _ in range(n)]
        for j in range(n):
            basis = [0] * n
            basis[j] = 1
            col = self.host.to_list(self.host.mul(c_host, self.host.from_list(basis)))
            for i, coeff in enumerate(col):
                if coeff:
                    out[i] = out[i] + lcs[j].scale(coeff)
        return self.from_lcs(out)

    # -- multiplications (Karatsuba; cost = #base muls) ---------------------
    def mul(self, a, b):
        B = self.base
        if self.k == 2:
            a0, a1 = a
            b0, b1 = b
            t0 = B.mul(a0, b0)
            t1 = B.mul(a1, b1)
            mid = B.sub(
                B.sub(B.mul(B.add(a0, a1), B.add(b0, b1)), t0), t1
            )
            return (B.add(t0, self._mul_nr_base(t1)), mid)
        a0, a1, a2 = a
        b0, b1, b2 = b
        t0 = B.mul(a0, b0)
        t1 = B.mul(a1, b1)
        t2 = B.mul(a2, b2)
        s01 = B.sub(B.sub(B.mul(B.add(a0, a1), B.add(b0, b1)), t0), t1)
        s02 = B.sub(B.sub(B.mul(B.add(a0, a2), B.add(b0, b2)), t0), t2)
        s12 = B.sub(B.sub(B.mul(B.add(a1, a2), B.add(b1, b2)), t1), t2)
        c0 = B.add(t0, self._mul_nr_base(s12))
        c1 = B.add(s01, self._mul_nr_base(t2))
        c2 = B.add(s02, t1)
        return (c0, c1, c2)

    def _mul_nr_base(self, x):
        """Multiply base-field gadget element by nr (free: nr is constant)."""
        if isinstance(self.base, GadgetFp):
            return self.base.mul_constant(x, self.nr_host)
        return self.base.mul_constant(x, self.nr_host)

    def sqr(self, a):
        B = self.base
        if self.k == 2:
            # complex squaring: 2 base muls instead of 3
            a0, a1 = a
            t1 = B.mul(a0, a1)
            t0 = B.mul(
                B.add(a0, a1), B.add(a0, self._mul_nr_base(a1))
            )
            nr_t1 = self._mul_nr_base(t1)
            c0 = B.sub(B.sub(t0, t1), nr_t1)
            c1 = B.add(t1, t1)
            return (c0, c1)
        return self.mul(a, a)

    def mul_base(self, a, s):
        """Multiply by a (variable) element of the immediate base field."""
        return tuple(self.base.mul(x, s) for x in a)

    # -- inversion ----------------------------------------------------------
    def inv(self, a):
        """Allocate c and enforce c * a == 1.

        Witness hook computes the host inverse (0 if a == 0, in which case
        the constraint system is unsatisfiable -- callers on result-bit
        paths use inv_or_zero semantics at the top level instead).
        """
        c = self.alloc()
        self._hook_inverse(c, a)
        prod = self.mul(c, a)
        self.enforce_equal(prod, self.one())
        return c

    def _hook_inverse(self, c_elem, a_elem):
        pb = self.pb
        a_lcs = self.to_lcs(a_elem)
        c_idxs = [lc.terms[0][0] for lc in self.to_lcs(c_elem)]
        host = self.host

        def fn(w, _a=a_lcs, _c=c_idxs, _pb=pb, _h=host):
            vals = [_pb.lc_val(w, lc) for lc in _a]
            hv = _h.from_list(vals)
            if _h.is_zero(hv):
                inv_flat = [0] * len(_c)
            else:
                inv_flat = _h.to_list(_h.inv(hv))
            for idx, v in zip(_c, inv_flat):
                w[idx] = v

        pb.add_hook(fn)

    # -- equality -----------------------------------------------------------
    def enforce_equal(self, a, b):
        for la, lb in zip(self.to_lcs(a), self.to_lcs(b)):
            self.pb.enforce_equal(la, lb)

    def is_equal_bit(self, a, b) -> LC:
        """Single bit: 1 iff a == b (total). AND over coordinate equality."""
        pb = self.pb
        bits = [
            pb.is_equal_bit(la, lb)
            for la, lb in zip(self.to_lcs(a), self.to_lcs(b))
        ]
        acc = bits[0]
        for b2 in bits[1:]:
            acc = pb.bit_and(acc, b2)
        return acc

    def select(self, bit: LC, if_one, if_zero):
        lcs = [
            self.pb.select(bit, la, lb)
            for la, lb in zip(self.to_lcs(if_one), self.to_lcs(if_zero))
        ]
        return self.from_lcs(lcs)

    # -- Frobenius (free linear map) ----------------------------------------
    def _frobenius_matrix(self, power: int):
        """Columns of x -> x^(q^power) over the flattened basis (host ints).

        The power-1 matrix is computed once per (host field, prime) by
        exponentiation; higher powers compose that matrix with itself
        (computing x^(q^k) directly needs multi-thousand-bit tower pows and
        dominated circuit-build time before this cache).
        """
        q = self._bottom_prime()
        key = (id(self.host), q, self.degree)
        cache = _FROB_CACHE.setdefault(key, {})
        if power in cache:
            return cache[power]
        host = self.host
        n = self.degree
        if 1 not in cache:
            cols = []
            for j in range(n):
                basis = [0] * n
                basis[j] = 1
                img = host.pow(host.from_list(basis), q)
                cols.append(host.to_list(img))
            cache[1] = cols
        m1 = cache[1]
        k = max(kk for kk in cache if kk <= power)
        mk = cache[k]
        p_mod = q
        while k < power:
            # compose: M_{k+1}[j] = M1 applied to column j of M_k
            nxt = []
            for j in range(n):
                col = mk[j]
                out = [0] * n
                for src_i, coeff in enumerate(col):
                    if coeff:
                        for dst_i, m1c in enumerate(m1[src_i]):
                            if m1c:
                                out[dst_i] = (
                                    out[dst_i] + coeff * m1c
                                ) % p_mod
                nxt.append(out)
            mk = nxt
            k += 1
            cache[k] = mk
        return cache[power]

    def _bottom_prime(self) -> int:
        f = self.host
        while not isinstance(f, hf.PrimeField):
            f = f.base
        return f.p

    def frobenius(self, a, power: int = 1):
        if power % self.degree == 0:
            return a
        cols = self._frobenius_matrix(power % self.degree)
        lcs = self.to_lcs(a)
        n = self.degree
        out = [LC() for _ in range(n)]
        for j in range(n):
            for i, coeff in enumerate(cols[j]):
                if coeff:
                    out[i] = out[i] + lcs[j].scale(coeff)
        return self.from_lcs(out)

    # -- flattening / allocation -------------------------------------------
    def to_lcs(self, a) -> List[LC]:
        out: List[LC] = []
        for c in a:
            out.extend(self.base.to_lcs(c))
        return out

    def from_lcs(self, lcs: Sequence[LC]):
        step = self.degree // self.k
        return tuple(
            self.base.from_lcs(lcs[i * step : (i + 1) * step])
            for i in range(self.k)
        )

    def alloc(self):
        return self.from_lcs(
            [LC.of_var(self.pb.allocate()) for _ in range(self.degree)]
        )

    def constant_from_flat(self, flat: Sequence[int]):
        return self.from_lcs([LC.const(c) for c in flat])

    def value(self, w, a):
        """Evaluate a gadget element to a host-field value."""
        return self.host.from_list(
            [self.pb.lc_val(w, lc) for lc in self.to_lcs(a)]
        )


# ---------------------------------------------------------------------------
# Tower construction mirroring zecale_tpu.ff.host_field.towers
# ---------------------------------------------------------------------------


def gadget_towers(pb: Protoboard, nested_curve: str):
    """Gadget-field towers of the NESTED curve, arithmetized over the wrapper
    circuit's native scalar field (pb.r == Fq of the nested curve; reference:
    aggregator_gadget.hpp:20-30)."""
    from ..ff import params as PP

    host_t = hf.towers(nested_curve)
    assert pb.r == PP.CURVES[nested_curve].q, (
        "wrapper scalar field must equal nested base field"
    )
    fp = GadgetFp(pb, host_t["fq"])
    out = {"fq": fp}
    if nested_curve == "bls12-377":
        fq2 = GadgetExt(fp, 2, PP.BLS12_377_FQ2_QNR, host_t["fq2"])
        fq6 = GadgetExt(fq2, 3, host_t["fq2"].gen(), host_t["fq6"])
        fq12 = GadgetExt(fq6, 2, host_t["fq6"].gen(), host_t["fq12"])
        out.update(fq2=fq2, fq6=fq6, fq12=fq12, fg2=fq2, fqk=fq12)
    elif nested_curve == "mnt4-298":
        fq2 = GadgetExt(fp, 2, PP.MNT4_298_QNR, host_t["fq2"])
        fq4 = GadgetExt(fq2, 2, host_t["fq2"].gen(), host_t["fq4"])
        out.update(fq2=fq2, fq4=fq4, fg2=fq2, fqk=fq4)
    else:
        raise KeyError(f"unsupported nested curve: {nested_curve}")
    return out
