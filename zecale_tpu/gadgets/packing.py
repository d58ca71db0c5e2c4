"""Bit (un)packing gadgets.

Equivalent of libsnark's packing_gadget / multipacking_gadget as used by the
reference aggregator (aggregator_circuit.tcc:84-89, aggregator_gadget.tcc:
42-59): converting packed wrapper-field elements to fixed-width bit strings
and back.
"""

from __future__ import annotations

from typing import List

from .protoboard import LC, Protoboard


def unpack_bits(pb: Protoboard, x: LC, num_bits: int) -> List[LC]:
    """Allocate ``num_bits`` boolean vars b_i with sum b_i 2^i == x.

    Returns bits LSB-first.  Soundness requires num_bits < log2(r) (no
    wrap-around aliasing), which holds for every use here (nested scalars
    packed into the strictly larger wrapper field;
    aggregator_gadget.tcc:38 asserts the same in the reference).
    """
    # The reference allows nested and wrapper scalar fields of EQUAL bit
    # length (MNT cycle; aggregator_gadget.tcc:38 asserts <=).  With equal
    # widths the top slice [r, 2^num_bits) aliases, which (as in the
    # reference) only lets a malicious prover flip a result bit to 0.
    assert num_bits <= pb.r.bit_length(), "unpacking wider than the field"
    bit_vars = pb.allocate_array(num_bits)

    def fn(w, _x=x, _bits=bit_vars, _pb=pb):
        v = _pb.lc_val(w, _x)
        for i, idx in enumerate(_bits):
            w[idx] = (v >> i) & 1

    pb.add_hook(fn, op=("unpack", bit_vars[0], num_bits, x))
    bits = [LC.of_var(i) for i in bit_vars]
    for b in bits:
        pb.enforce_boolean(b)
    pb.enforce_equal(pack_lc(bits), x)
    return bits


def pack_lc(bits: List[LC]) -> LC:
    """Linear combination sum b_i 2^i (free)."""
    acc = LC()
    for i, b in enumerate(bits):
        acc = acc + b.scale(1 << i)
    return acc


def pack_bits(pb: Protoboard, bits: List[LC]) -> LC:
    """Pack boolean LCs into one field element (bits assumed boolean)."""
    return pack_lc(bits)
