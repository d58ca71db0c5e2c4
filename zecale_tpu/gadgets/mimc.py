"""MiMC permutation, Miyaguchi-Preneel compression and input hasher —
both out-of-circuit (host ints) and in-circuit (gadget).

Role: the nested-verification-key hash that binds a wrapper proof to one
specific nested statement (reference: verification_key_hash_gadget.hpp:24-33
wrapping libzeth's mimc_input_hasher; round/exponent selection per curve in
compression_function_selector.hpp:23-51 — BW6-761 uses x^17 with 93 rounds,
MNT4/MNT6 x^17 with 73 rounds).

Round constants: zeth derives its constants in the (absent) zeth submodule,
so bit-compat cannot be validated in this environment (see KNOWN_GAPS.md #3;
the golden batch was generated with the null hash anyway).  We derive
constants deterministically and reproducibly:

    c_0 = 0;  c_i = int.from_bytes(sha3_256(seed || be64(i))) mod r,

with seed = b"clearmatics_mt_seed" (the seed string zeth documents for its
MiMC constant generation).

Permutation (keyed, MiMC-style):  x_{i+1} = (x_i + k + c_i)^e  for rounds
i = 0..R-1, output x_R + k.
Miyaguchi-Preneel:  MP(m, k) = perm_k(m) + m + k.
Input hasher: h_0 = 0;  h_{j+1} = MP(v_j, h_j);  digest = h_n.
"""

from __future__ import annotations

import functools
import hashlib
from typing import List, Sequence

from .protoboard import LC, Protoboard

SEED = b"clearmatics_mt_seed"


@functools.lru_cache(maxsize=None)
def round_constants(r: int, rounds: int) -> tuple:
    out = [0]
    for i in range(1, rounds):
        h = hashlib.sha3_256(SEED + i.to_bytes(8, "big")).digest()
        out.append(int.from_bytes(h, "big") % r)
    return tuple(out)


def params_for_field(r: int) -> tuple:
    """(exponent, rounds) per scalar field, mirroring the reference's
    compression_function_selector (BW6-761: e=17,r=93; MNT: e=17,r=73).

    The selector follows the MiMC rule rounds = ceil(bits / log2(e)) with
    e = 17, which reproduces the reference's pinned values exactly
    (377 bits -> 93, 298 bits -> 73) and extends to the nested fields
    (BLS12-377 Fr, 253 bits -> 62) used by the joinsplit tree hash."""
    import math

    e = 17
    return e, math.ceil(r.bit_length() / math.log2(e))


# ---------------------------------------------------------------------------
# host path
# ---------------------------------------------------------------------------


def mimc_permute(x: int, key: int, r: int) -> int:
    e, rounds = params_for_field(r)
    cs = round_constants(r, rounds)
    for c in cs:
        x = pow((x + key + c) % r, e, r)
    return (x + key) % r


def mimc_mp(m: int, k: int, r: int) -> int:
    return (mimc_permute(m, k, r) + m + k) % r


def mimc_hash_inputs(values: Sequence[int], r: int) -> int:
    h = 0
    for v in values:
        h = mimc_mp(v % r, h, r)
    return h


# ---------------------------------------------------------------------------
# gadget path
# ---------------------------------------------------------------------------


def _pow_e_gadget(pb: Protoboard, t: LC, e: int) -> LC:
    """t^e with square-and-multiply (e = 17: 4 squarings + 1 mul)."""
    assert e >= 2
    bits = bin(e)[2:]
    acc = t
    for bit in bits[1:]:
        acc = pb.square(acc)
        if bit == "1":
            acc = pb.mul(acc, t)
    return acc


def mimc_permute_gadget(pb: Protoboard, x: LC, key: LC) -> LC:
    e, rounds = params_for_field(pb.r)
    cs = round_constants(pb.r, rounds)
    for c in cs:
        t = x + key + LC.const(c)
        x = _pow_e_gadget(pb, t, e)
    return x + key


def mimc_mp_gadget(pb: Protoboard, m: LC, k: LC) -> LC:
    return mimc_permute_gadget(pb, m, k) + m + k


def mimc_hash_inputs_gadget(pb: Protoboard, values: List[LC]) -> LC:
    h = LC()
    for v in values:
        h = mimc_mp_gadget(pb, v, h)
    return h
