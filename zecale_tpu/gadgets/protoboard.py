"""Constraint-system builder ("protoboard") and linear-combination algebra.

Equivalent role to libsnark's ``protoboard``/``pb_variable``/``gadget``
machinery in the reference stack (SURVEY.md section 2b, "libsnark —
relations/protoboard"), redesigned for this framework:

  * Constraints accumulate into the flat sparse R1CS of
    ``zecale_tpu.snark.r1cs`` (directly exportable as index/coefficient
    tensors for the TPU prover kernels).
  * Witness generation is a recorded program: every gadget that allocates
    intermediate variables appends a *hook* (a Python closure) at build time;
    proving replays the hooks in order against a fresh assignment.  This
    mirrors the reference's two-phase generate_r1cs_constraints /
    generate_r1cs_witness flow (aggregator_circuit.tcc:60-97,119-170) while
    keeping the circuit reusable across proofs.

Variable numbering follows libsnark: 0 is the constant ONE; primary (public)
variables must be allocated before any auxiliary variable.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Sequence, Tuple

from ..snark.r1cs import R1CS


class LC:
    """Sparse linear combination  sum_i coeff_i * var_i  over F_r.

    Immutable; supports +, -, scalar *.  ``LC.const(pb, c)`` is c * ONE.
    """

    __slots__ = ("terms",)

    def __init__(self, terms: Iterable[Tuple[int, int]] = ()):
        # normalize: merge duplicate variable indices
        merged: Dict[int, int] = {}
        for idx, coeff in terms:
            merged[idx] = merged.get(idx, 0) + coeff
        self.terms: Tuple[Tuple[int, int], ...] = tuple(
            (i, c) for i, c in merged.items() if c != 0
        )

    @staticmethod
    def of_var(idx: int, coeff: int = 1) -> "LC":
        return LC([(idx, coeff)])

    @staticmethod
    def const(c: int) -> "LC":
        return LC([(0, c)])

    def __add__(self, other: "LC") -> "LC":
        return LC(self.terms + other.terms)

    def __sub__(self, other: "LC") -> "LC":
        return LC(self.terms + tuple((i, -c) for i, c in other.terms))

    def __neg__(self) -> "LC":
        return LC(tuple((i, -c) for i, c in self.terms))

    def scale(self, k: int) -> "LC":
        return LC(tuple((i, c * k) for i, c in self.terms))

    def is_zero(self) -> bool:
        return not self.terms

    def as_list(self) -> List[Tuple[int, int]]:
        return list(self.terms)


class Protoboard:
    """Accumulates variables, constraints and the witness program."""

    def __init__(self, r: int):
        self.r = r
        self._num_vars = 1  # var 0 == ONE
        self.num_primary = 0
        self._primary_sealed = False
        self.constraints: List[Tuple[LC, LC, LC]] = []
        self.witness_hooks: List[Callable[[List[int]], None]] = []
        self.ONE = LC.const(1)

    # -- allocation ---------------------------------------------------------
    def allocate(self) -> int:
        idx = self._num_vars
        self._num_vars += 1
        return idx

    def allocate_array(self, n: int) -> List[int]:
        return [self.allocate() for _ in range(n)]

    def allocate_primary(self) -> int:
        assert not self._primary_sealed, (
            "primary inputs must be allocated before auxiliary variables"
        )
        self.num_primary += 1
        return self.allocate()

    def allocate_primary_array(self, n: int) -> List[int]:
        return [self.allocate_primary() for _ in range(n)]

    def seal_primary(self) -> None:
        self._primary_sealed = True

    @property
    def num_variables(self) -> int:
        return self._num_vars

    # -- constraints --------------------------------------------------------
    def add_r1cs(self, a: LC, b: LC, c: LC) -> None:
        """Constrain <a, w> * <b, w> == <c, w>."""
        if not self._primary_sealed:
            self._primary_sealed = True
        self.constraints.append((a, b, c))

    def enforce_equal(self, a: LC, b: LC) -> None:
        self.add_r1cs(a - b, self.ONE, LC())

    def enforce_boolean(self, x: LC) -> None:
        """x * (x - 1) == 0."""
        self.add_r1cs(x, x - self.ONE, LC())

    # -- witness program ----------------------------------------------------
    def add_hook(self, fn: Callable[[List[int]], None]) -> None:
        self.witness_hooks.append(fn)

    def lc_val(self, assignment: List[int], lc: LC) -> int:
        acc = 0
        for idx, coeff in lc.terms:
            acc += coeff * assignment[idx]
        return acc % self.r

    def mul_hook(self, out_idx: int, a: LC, b: LC) -> None:
        """Hook computing out = <a,w> * <b,w>."""

        def fn(w: List[int], _a=a, _b=b, _o=out_idx, _pb=self):
            w[_o] = _pb.lc_val(w, _a) * _pb.lc_val(w, _b) % _pb.r

        self.add_hook(fn)

    # -- common gadget primitives ------------------------------------------
    def mul(self, a: LC, b: LC) -> LC:
        """Allocate v with constraint a * b == v; returns v as an LC."""
        v = self.allocate()
        self.add_r1cs(a, b, LC.of_var(v))
        self.mul_hook(v, a, b)
        return LC.of_var(v)

    def square(self, a: LC) -> LC:
        return self.mul(a, a)

    def div(self, a: LC, b: LC) -> LC:
        """Allocate v with constraint v * b == a (i.e. v = a / b).

        Witness-total: if b evaluates to 0 the hook assigns v = 0 and the
        constraint only holds if a == 0 as well; division gadget callers on
        the *result-bit* paths must guard accordingly.
        """
        v = self.allocate()

        def fn(w: List[int], _a=a, _b=b, _v=v, _pb=self):
            bv = _pb.lc_val(w, _b)
            av = _pb.lc_val(w, _a)
            w[_v] = 0 if bv == 0 else av * pow(bv, _pb.r - 2, _pb.r) % _pb.r

        self.add_hook(fn)
        self.add_r1cs(LC.of_var(v), b, a)
        return LC.of_var(v)

    def inv_or_zero(self, a: LC) -> Tuple[LC, LC]:
        """Return (a_inv, is_nonzero_bit) with total witness semantics.

        Constraints: a * a_inv == nz;  a * (1 - nz) == 0;  nz boolean.
        """
        ainv = self.allocate()
        nz = self.allocate()

        def fn(w: List[int], _a=a, _ai=ainv, _nz=nz, _pb=self):
            av = _pb.lc_val(w, _a)
            if av == 0:
                w[_ai] = 0
                w[_nz] = 0
            else:
                w[_ai] = pow(av, _pb.r - 2, _pb.r)
                w[_nz] = 1

        self.add_hook(fn)
        nz_lc = LC.of_var(nz)
        self.add_r1cs(a, LC.of_var(ainv), nz_lc)
        self.add_r1cs(a, self.ONE - nz_lc, LC())
        self.enforce_boolean(nz_lc)
        return LC.of_var(ainv), nz_lc

    def is_equal_bit(self, a: LC, b: LC) -> LC:
        """Bit that is 1 iff <a,w> == <b,w> (total)."""
        _, nz = self.inv_or_zero(a - b)
        return self.ONE - nz

    def bit_and(self, a: LC, b: LC) -> LC:
        return self.mul(a, b)

    def select(self, bit: LC, if_one: LC, if_zero: LC) -> LC:
        """bit ? if_one : if_zero  (bit must be boolean)."""
        return self.mul(bit, if_one - if_zero) + if_zero

    # -- finalize -----------------------------------------------------------
    def to_r1cs(self) -> R1CS:
        r1cs = R1CS(
            r=self.r,
            num_primary=self.num_primary,
            num_aux=self._num_vars - 1 - self.num_primary,
        )
        for a, b, c in self.constraints:
            r1cs.add_constraint(a.as_list(), b.as_list(), c.as_list())
        return r1cs

    def generate_witness(
        self, primary: Sequence[int], extra_setter=None
    ) -> List[int]:
        """Replay the witness program.

        ``primary``: values for the primary inputs (in allocation order).
        ``extra_setter(assignment)``: optional callback run before hooks to
        seed non-primary free inputs (e.g. the nested proofs being verified).
        """
        w = [0] * self._num_vars
        w[0] = 1
        assert len(primary) == self.num_primary
        for i, v in enumerate(primary):
            w[1 + i] = v % self.r
        if extra_setter is not None:
            extra_setter(w)
        for hook in self.witness_hooks:
            hook(w)
        return w
