"""ctypes bindings for the native witness/constraint engine
(csrc/witness_engine.c).  Compiled on demand with gcc; every entry point has
a pure-Python fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import tempfile
from typing import List, Optional, Sequence

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "witness_engine.c",
)
_SO = os.path.join(tempfile.gettempdir(), "zecale_witness_engine.so")

LIMB64 = 64


def _limbs64(x: int, nl: int) -> np.ndarray:
    out = np.empty(nl, dtype=np.uint64)
    for i in range(nl):
        out[i] = (x >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
    return out


def _from_limbs64(a: np.ndarray) -> int:
    acc = 0
    for i, v in enumerate(a.tolist()):
        acc |= int(v) << (64 * i)
    return acc


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            subprocess.run(
                ["gcc", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.fp_ctx_size.restype = ctypes.c_long
        return lib
    except Exception:
        return None


class NativeField:
    """Per-modulus native context (None if the engine is unavailable)."""

    def __init__(self, p: int):
        self.p = p
        self.nl = -(-p.bit_length() // LIMB64)
        assert self.nl <= 12
        self.lib = _lib()
        if self.lib is None:
            self.ctx = None
            return
        R = 1 << (64 * self.nl)
        self.ctx = ctypes.create_string_buffer(self.lib.fp_ctx_size())
        self.lib.fp_init(
            self.ctx,
            self.nl,
            _limbs64(p, self.nl).ctypes.data_as(ctypes.c_void_p),
            _limbs64(R * R % p, self.nl).ctypes.data_as(ctypes.c_void_p),
            ctypes.c_uint64((-pow(p, -1, 1 << 64)) % (1 << 64)),
        )

    @property
    def available(self) -> bool:
        return self.ctx is not None

    # -- packing ------------------------------------------------------------
    def pack(self, ints: Sequence[int]) -> np.ndarray:
        out = np.empty((len(ints), self.nl), dtype=np.uint64)
        for i, x in enumerate(ints):
            out[i] = _limbs64(x % self.p, self.nl)
        return out

    def unpack(self, arr: np.ndarray) -> List[int]:
        return [_from_limbs64(row) for row in arr]

    def to_mont(self, arr: np.ndarray) -> np.ndarray:
        out = np.empty_like(arr)
        self.lib.fp_to_mont_batch(
            self.ctx,
            out.ctypes.data_as(ctypes.c_void_p),
            arr.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_long(arr.shape[0]),
        )
        return out

    def from_mont(self, arr: np.ndarray) -> np.ndarray:
        out = np.empty_like(arr)
        self.lib.fp_from_mont_batch(
            self.ctx,
            out.ctypes.data_as(ctypes.c_void_p),
            arr.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_long(arr.shape[0]),
        )
        return out


@functools.lru_cache(maxsize=None)
def native_field(p: int) -> NativeField:
    return NativeField(p)


class NativeR1CS:
    """Pre-packed sparse R1CS bound to the native engine for fast
    repeated evaluation (the hot host-side step of every prove call)."""

    def __init__(self, r1cs):
        self.r1cs = r1cs
        self.F = native_field(r1cs.r)
        if not self.F.available:
            return
        mats = r1cs.to_sparse_tensors()
        self.packed = []
        for rows, cols, vals in mats:
            self.packed.append(
                (
                    np.asarray(rows, dtype=np.int32),
                    np.asarray(cols, dtype=np.int32),
                    self.F.to_mont(self.F.pack(vals)),
                )
            )

    @property
    def available(self) -> bool:
        return self.F.available

    def abc_evaluations(self, assignment: Sequence[int]):
        """Az, Bz, Cz over the padded QAP domain (standard form ints),
        bit-identical to R1CS.abc_evaluations."""
        r1cs = self.r1cs
        n = r1cs.qap_degree
        asg_m = self.F.to_mont(self.F.pack(list(assignment)))
        outs = []
        for rows, cols, coeffs_m in self.packed:
            acc = np.zeros((n, self.F.nl), dtype=np.uint64)
            self.F.lib.lc_matvec(
                self.F.ctx,
                acc.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_long(n),
                rows.ctypes.data_as(ctypes.c_void_p),
                cols.ctypes.data_as(ctypes.c_void_p),
                coeffs_m.ctypes.data_as(ctypes.c_void_p),
                asg_m.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_long(len(rows)),
            )
            outs.append(self.F.unpack(self.F.from_mont(acc)))
        az, bz, cz = outs
        # hardening rows: az[m + i] = assignment[i]
        m = r1cs.num_constraints
        for i in range(r1cs.num_primary + 1):
            az[m + i] = assignment[i] % r1cs.r
        return az, bz, cz

    def first_failing_constraint(self, assignment: Sequence[int]):
        az, bz, cz = self.abc_evaluations(assignment)
        r = self.r1cs.r
        for i in range(self.r1cs.num_constraints):
            if az[i] * bz[i] % r != cz[i]:
                return i
        return None
