"""The canonical 1-constraint "dummy application" used throughout the test
pyramid: prove knowledge of the multiplicative inverse of a public scalar.

Mirrors the reference's nested test application
(libzecale/tests/circuits/dummy_application.tcc:26-54): one public input
``a``, one auxiliary ``a_inv``, one constraint ``a * a_inv == 1``.
Golden vectors testdata/dummy_app/extproof{1..6}.json are proofs of this
statement for a in {7..12}.
"""

from __future__ import annotations

import random
from typing import List, Optional, Tuple

from ..ff import params as P
from ..snark.groth16 import ExtendedProof, Groth16, Groth16KeyPair
from ..snark.r1cs import R1CS


def dummy_app_r1cs(curve_name: str) -> R1CS:
    r1cs = R1CS(r=P.CURVES[curve_name].r, num_primary=1, num_aux=1)
    # variables: 0 = ONE, 1 = a (public), 2 = a_inv (aux);  a * a_inv = 1
    r1cs.add_constraint([(1, 1)], [(2, 1)], [(0, 1)])
    return r1cs


def dummy_app_assignment(curve_name: str, a: int) -> List[int]:
    r = P.CURVES[curve_name].r
    a %= r
    return [1, a, pow(a, r - 2, r)]


def _snark_backend(curve_name: str, snark: str):
    if snark.upper() == "GROTH16":
        return Groth16(curve_name)
    if snark.upper() == "PGHR13":
        from ..snark.pghr13 import Pghr13

        return Pghr13(curve_name)
    raise KeyError(f"unknown snark: {snark}")


def dummy_app_setup(
    curve_name: str,
    rng: Optional[random.Random] = None,
    snark: str = "GROTH16",
) -> Tuple[R1CS, Groth16KeyPair]:
    r1cs = dummy_app_r1cs(curve_name)
    backend = _snark_backend(curve_name, snark)
    return r1cs, backend.generate_setup(r1cs, rng)


def dummy_app_prove(
    curve_name: str,
    keypair: Groth16KeyPair,
    a: int,
    rng: Optional[random.Random] = None,
    snark: str = "GROTH16",
) -> ExtendedProof:
    r1cs = dummy_app_r1cs(curve_name)
    backend = _snark_backend(curve_name, snark)
    assignment = dummy_app_assignment(curve_name, a)
    assert r1cs.is_satisfied(assignment)
    proof = backend.prove(r1cs, keypair.pk, assignment, rng)
    return ExtendedProof(proof=proof, inputs=[a % P.CURVES[curve_name].r])
