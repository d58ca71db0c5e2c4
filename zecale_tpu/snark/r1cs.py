"""Rank-1 Constraint System representation and R1CS -> QAP reduction.

Plays the role of libsnark's ``r1cs_constraint_system`` +
``r1cs_to_qap_instance_map`` in the reference stack (SURVEY.md section 2b),
but stores constraints as flat sparse triples so they can be exported
directly as index/coefficient tensors for the TPU witness/prover kernels.

Variable numbering (libsnark-compatible):
  0                      the constant ONE
  1 .. num_primary       primary (public) inputs
  num_primary+1 ..       auxiliary (witness) variables

QAP reduction: constraints are mapped to the first ``m`` points of a radix-2
evaluation domain; following the standard Groth16 hardening, one extra row
per public variable (including ONE) is appended with A := that variable,
B := 0, C := 0, which pins public inputs into the A polynomials.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Sequence, Tuple

from ..poly.domain_host import domain, next_power_of_two

# A linear combination is a list of (variable_index, coefficient) pairs.
LinComb = List[Tuple[int, int]]


@dataclasses.dataclass
class R1CS:
    r: int  # scalar field modulus
    num_primary: int = 0
    num_aux: int = 0
    constraints: List[Tuple[LinComb, LinComb, LinComb]] = dataclasses.field(
        default_factory=list
    )

    # ------------------------------------------------------------------
    @property
    def num_variables(self) -> int:
        """Total variable count including the constant ONE (index 0)."""
        return 1 + self.num_primary + self.num_aux

    @property
    def num_constraints(self) -> int:
        return len(self.constraints)

    def add_constraint(self, a: LinComb, b: LinComb, c: LinComb) -> None:
        self.constraints.append((a, b, c))

    # ------------------------------------------------------------------
    @staticmethod
    def eval_lc(lc: LinComb, assignment: Sequence[int], r: int) -> int:
        acc = 0
        for idx, coeff in lc:
            acc += coeff * assignment[idx]
        return acc % r

    def is_satisfied(self, assignment: Sequence[int]) -> bool:
        if len(assignment) != self.num_variables or assignment[0] != 1:
            return False
        r = self.r
        for a, b, c in self.constraints:
            if (
                self.eval_lc(a, assignment, r) * self.eval_lc(b, assignment, r)
                - self.eval_lc(c, assignment, r)
            ) % r != 0:
                return False
        return True

    def first_failing_constraint(self, assignment: Sequence[int]):
        r = self.r
        for i, (a, b, c) in enumerate(self.constraints):
            if (
                self.eval_lc(a, assignment, r) * self.eval_lc(b, assignment, r)
                - self.eval_lc(c, assignment, r)
            ) % r != 0:
                return i
        return None

    # ------------------------------------------------------------------
    # QAP reduction
    # ------------------------------------------------------------------
    @property
    def qap_degree(self) -> int:
        """Domain size for the QAP (constraints + one row per public var)."""
        return next_power_of_two(self.num_constraints + self.num_primary + 1)

    def qap_evaluations(self, tau: int, r: int):
        """(A_i(tau), B_i(tau), C_i(tau)) for every variable i."""
        d = domain(self.qap_degree, r)
        lag = d.lagrange_at(tau)
        nv = self.num_variables
        a_at = [0] * nv
        b_at = [0] * nv
        c_at = [0] * nv
        for row, (a, b, c) in enumerate(self.constraints):
            lrow = lag[row]
            for idx, coeff in a:
                a_at[idx] = (a_at[idx] + coeff * lrow) % r
            for idx, coeff in b:
                b_at[idx] = (b_at[idx] + coeff * lrow) % r
            for idx, coeff in c:
                c_at[idx] = (c_at[idx] + coeff * lrow) % r
        # hardening rows: A_i += L_{m+i} for public vars i in [0, num_primary]
        m = self.num_constraints
        for i in range(self.num_primary + 1):
            a_at[i] = (a_at[i] + lag[m + i]) % r
        return a_at, b_at, c_at

    def domain_vanishing(self, tau: int, r: int):
        d = domain(self.qap_degree, r)
        return d.size, d.vanishing_at(tau)

    # ------------------------------------------------------------------
    def abc_evaluations(self, assignment: Sequence[int]):
        """Az, Bz, Cz over the QAP domain rows (constraint evaluations)."""
        r = self.r
        n = self.qap_degree
        az = [0] * n
        bz = [0] * n
        cz = [0] * n
        for row, (a, b, c) in enumerate(self.constraints):
            az[row] = self.eval_lc(a, assignment, r)
            bz[row] = self.eval_lc(b, assignment, r)
            cz[row] = self.eval_lc(c, assignment, r)
        m = self.num_constraints
        for i in range(self.num_primary + 1):
            az[m + i] = assignment[i] % r
        return az, bz, cz

    def h_coefficients(self, assignment: Sequence[int], r: int) -> List[int]:
        """Coefficients of H(x) = (A(x) B(x) - C(x)) / Z(x), degree < d-1.

        Computed the standard way: iFFT the row evaluations, re-evaluate on a
        multiplicative coset, divide by Z (constant on the coset), iFFT back.
        """
        d = domain(self.qap_degree, r)
        az, bz, cz = self.abc_evaluations(assignment)
        a_coeffs = d.ifft(az)
        b_coeffs = d.ifft(bz)
        c_coeffs = d.ifft(cz)
        a_cs = d.coset_fft(a_coeffs)
        b_cs = d.coset_fft(b_coeffs)
        c_cs = d.coset_fft(c_coeffs)
        h_cs = d.divide_by_z_on_coset(
            [(ai * bi - ci) % r for ai, bi, ci in zip(a_cs, b_cs, c_cs)]
        )
        h = d.coset_ifft(h_cs)
        # degree of H is at most d-2; the top coefficient must vanish
        assert h[-1] == 0, "H(x) has unexpected degree (unsatisfied R1CS?)"
        return h[:-1]

    # ------------------------------------------------------------------
    # flat export for TPU kernels
    # ------------------------------------------------------------------
    def to_sparse_tensors(self):
        """Export as three (row, col, coeff) int lists for JAX segment ops."""
        mats = []
        for which in range(3):
            rows: List[int] = []
            cols: List[int] = []
            vals: List[int] = []
            for row, cons in enumerate(self.constraints):
                for idx, coeff in cons[which]:
                    rows.append(row)
                    cols.append(idx)
                    vals.append(coeff % self.r)
            mats.append((rows, cols, vals))
        return mats
