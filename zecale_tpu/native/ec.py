"""ctypes bindings for the native EC engine (csrc/ec_engine.c): Jacobian
group law, Pippenger MSM, fixed-base batches, radix-2 FFT, batched
jac->affine.  Together with witness_engine.c this forms the framework's
native CPU runtime — the host-side replacement for libff multiexp +
libfqfft (SURVEY.md section 2b) used by the zero-hardware prover path and
as the oracle for the TPU kernels at scale.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import tempfile
from typing import List, Optional, Sequence

import numpy as np

from ..ff import params as P

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)
_SRCS = [
    os.path.join(_CSRC, "witness_engine.c"),
    os.path.join(_CSRC, "ec_engine.c"),
]
#: Sanitizer analog of the reference's -DSANITIZER builds
#: (/root/reference/cmake/sanitizers.cmake:17-91): ZECALE_NATIVE_SANITIZE=
#: address|undefined compiles the engine with the chosen sanitizer into a
#: separate .so (exercised by scripts/sanitize_check.py / `make sanitize`).
_SAN_FLAGS = {
    "address": ["-fsanitize=address", "-fno-omit-frame-pointer", "-g"],
    "undefined": ["-fsanitize=undefined", "-fno-sanitize-recover=all",
                  "-g"],
}


def sanitize_mode() -> str:
    mode = os.environ.get("ZECALE_NATIVE_SANITIZE", "").lower()
    assert mode in ("", *_SAN_FLAGS), mode
    return mode


def sanitizer_active() -> bool:
    return bool(sanitize_mode()) and _lib() is not None


def _so_path(base: str) -> str:
    mode = sanitize_mode()
    suffix = f".{mode}" if mode else ""
    return os.path.join(tempfile.gettempdir(), base + suffix + ".so")


_SO = _so_path("zecale_native")


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    try:
        so = _so_path("zecale_native")
        newest = max(os.path.getmtime(s) for s in _SRCS + [
            os.path.join(_CSRC, "fp_core.h")
        ])
        if not os.path.exists(so) or os.path.getmtime(so) < newest:
            subprocess.run(
                ["gcc", "-O3", "-fopenmp", "-shared", "-fPIC", "-o", so]
                + _SAN_FLAGS.get(sanitize_mode(), []) + _SRCS,
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.curve_ctx_size.restype = ctypes.c_long
        lib.ext_ctx_size.restype = ctypes.c_long
        return lib
    except Exception:
        return None


def available() -> bool:
    return _lib() is not None


def _u64s(x: int, nl: int) -> np.ndarray:
    return np.frombuffer(
        int(x).to_bytes(nl * 8, "little"), dtype=np.uint64
    ).copy()


def _ints_to_u64(vals: Sequence[int], nl: int) -> np.ndarray:
    buf = b"".join(int(v).to_bytes(nl * 8, "little") for v in vals)
    return np.frombuffer(buf, dtype=np.uint64).reshape(len(vals), nl).copy()


def _u64_to_int(a: np.ndarray) -> int:
    return int.from_bytes(a.tobytes(), "little")


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class NativeCurve:
    """One curve group (G1 of any curve; G2 where coords are Fq or Fq2)."""

    def __init__(self, curve_name: str, g2: bool = False):
        cp = P.CURVES[curve_name]
        self.curve_name = curve_name
        self.g2 = g2
        self.p = cp.q
        self.r = cp.r
        self.nl = -(-cp.q.bit_length() // 64)
        if g2 and cp.g2_degree == 2:
            self.k = 2
            if curve_name == "bls12-377":
                nr = P.BLS12_377_FQ2_QNR
            elif curve_name == "mnt4-298":
                nr = P.MNT4_298_QNR
            else:
                raise KeyError(curve_name)
        elif g2 and cp.g2_degree == 3:
            assert curve_name == "mnt6-298"
            self.k = 3
            nr = P.MNT6_298_QNR
        elif g2 and cp.g2_degree != 1:
            raise KeyError(f"unsupported G2 tower for {curve_name}")
        else:
            self.k = 1
            nr = 0
        self.ew = self.k * self.nl
        lib = _lib()
        assert lib is not None, "native engine unavailable"
        self.lib = lib
        self._ctx = ctypes.create_string_buffer(lib.curve_ctx_size())
        R = 1 << (64 * self.nl)
        r2 = R * R % self.p
        n0inv = (-pow(self.p, -1, 1 << 64)) % (1 << 64)
        self._R = R
        nr_m = _u64s(nr * R % self.p, self.nl)
        if g2:
            from ..ec import host_curve as hc

            a_host = hc.g2_curve(curve_name).a
        else:
            a_host = cp.a
        if self.k >= 2:
            if isinstance(a_host, tuple):
                a_coeffs = tuple(a_host) + (0,) * (self.k - len(a_host))
            else:
                a_coeffs = (a_host,) + (0,) * (self.k - 1)
            a_m = np.concatenate(
                [_u64s(c * R % self.p, self.nl) for c in a_coeffs]
            )
        else:
            a_m = _u64s((a_host if not isinstance(a_host, tuple) else a_host[0])
                        * R % self.p, self.nl)
        lib.curve_init(
            self._ctx,
            ctypes.c_int(self.nl),
            _ptr(_u64s(self.p, self.nl)),
            _ptr(_u64s(r2, self.nl)),
            ctypes.c_uint64(n0inv),
            ctypes.c_int(self.k),
            _ptr(nr_m),
            _ptr(a_m),
        )
        self._rinv = pow(R, self.p - 2, self.p)
        self.one_m = self._elem_to_mont(
            1 if self.k == 1 else (1,) + (0,) * (self.k - 1)
        )
        # Fermat exponent for inversion in the coordinate field
        inv_exp = self.p ** self.k - 2
        self._inv_exp = _u64s(inv_exp, -(-inv_exp.bit_length() // 64))

    # -- element packing -----------------------------------------------------
    def _elem_to_mont(self, v) -> np.ndarray:
        if self.k == 1:
            return _u64s(v % self.p * self._R % self.p, self.nl)
        return np.concatenate(
            [_u64s(c % self.p * self._R % self.p, self.nl) for c in v]
        )

    def _elem_from_mont(self, a: np.ndarray):
        rinv = self._rinv
        if self.k == 1:
            return _u64_to_int(a[: self.nl]) * rinv % self.p
        return tuple(
            _u64_to_int(a[i * self.nl : (i + 1) * self.nl]) * rinv % self.p
            for i in range(self.k)
        )

    def pack_points(self, pts: Sequence) -> tuple:
        """Host affine points (or None) -> (xy array (n, 2*ew), inf flags)."""
        n = len(pts)
        xy = np.zeros((n, 2 * self.ew), dtype=np.uint64)
        inf = np.zeros(n, dtype=np.uint8)
        for i, pt in enumerate(pts):
            if pt is None:
                inf[i] = 1
                continue
            xy[i, : self.ew] = self._elem_to_mont(pt[0])
            xy[i, self.ew :] = self._elem_to_mont(pt[1])
        return xy, inf

    def _jac_to_affine(self, jac: np.ndarray) -> list:
        n = jac.shape[0]
        xy = np.zeros((n, 2 * self.ew), dtype=np.uint64)
        inf = np.zeros(n, dtype=np.uint8)
        self.lib.jac_to_affine_batch(
            self._ctx,
            _ptr(xy),
            _u8ptr(inf),
            _ptr(jac),
            ctypes.c_long(n),
            _ptr(self._inv_exp),
            ctypes.c_int(len(self._inv_exp)),
            _ptr(self.one_m),
        )
        out = []
        for i in range(n):
            if inf[i]:
                out.append(None)
            else:
                out.append(
                    (
                        self._elem_from_mont(xy[i, : self.ew]),
                        self._elem_from_mont(xy[i, self.ew :]),
                    )
                )
        return out

    # -- MSM -------------------------------------------------------------
    def msm(self, scalars: Sequence[int], pts: Sequence, c: int = 0):
        """sum_i scalars[i] * pts[i] -> host affine point or None."""
        n = len(pts)
        assert len(scalars) == n
        if n == 0:
            return None
        if not c:
            c = max(4, min(14, n.bit_length() - 5))
        sbytes = -(-self.r.bit_length() // 8)
        sb = b"".join(
            int(s % self.r).to_bytes(sbytes, "little") for s in scalars
        )
        sarr = np.frombuffer(sb, dtype=np.uint8).reshape(n, sbytes).copy()
        xy, inf = self.pack_points(pts)
        out = np.zeros(3 * self.ew, dtype=np.uint64)
        self.lib.msm_pippenger(
            self._ctx,
            _ptr(out),
            _u8ptr(sarr),
            ctypes.c_long(sbytes),
            _ptr(xy),
            _u8ptr(inf),
            ctypes.c_long(n),
            ctypes.c_int(c),
            _ptr(self.one_m),
        )
        return self._jac_to_affine(out.reshape(1, -1))[0]

    def fixed_base_mul_batch(self, scalars: Sequence[int], base, c: int = 8):
        """[k_i] * base for all i -> list of host affine points."""
        n = len(scalars)
        sbytes = -(-self.r.bit_length() // 8)
        sb = b"".join(
            int(s % self.r).to_bytes(sbytes, "little") for s in scalars
        )
        sarr = np.frombuffer(sb, dtype=np.uint8).reshape(n, sbytes).copy()
        base_xy = np.concatenate(
            [self._elem_to_mont(base[0]), self._elem_to_mont(base[1])]
        )
        out = np.zeros((n, 3 * self.ew), dtype=np.uint64)
        self.lib.fixed_base_mul_batch(
            self._ctx,
            _ptr(out),
            _u8ptr(sarr),
            ctypes.c_long(sbytes),
            ctypes.c_long(n),
            _ptr(base_xy),
            ctypes.c_int(c),
            _ptr(self.one_m),
        )
        return self._jac_to_affine(out)


class NativeScalarField:
    """FFT + elementwise pipeline over a scalar field (k == 1)."""

    def __init__(self, r: int):
        self.r = r
        self.nl = -(-r.bit_length() // 64)
        lib = _lib()
        assert lib is not None
        self.lib = lib
        self._ctx = ctypes.create_string_buffer(lib.ext_ctx_size())
        R = 1 << (64 * self.nl)
        self._R = R
        n0inv = (-pow(r, -1, 1 << 64)) % (1 << 64)
        lib.ext_init(
            self._ctx,
            ctypes.c_int(self.nl),
            _ptr(_u64s(r, self.nl)),
            _ptr(_u64s(R * R % r, self.nl)),
            ctypes.c_uint64(n0inv),
            ctypes.c_int(1),
            _ptr(np.zeros(self.nl, dtype=np.uint64)),
        )
        self._rinv = pow(R, r - 2, r)
        self.one_m = _u64s(R % r, self.nl)

    def to_mont(self, vals: Sequence[int]) -> np.ndarray:
        return _ints_to_u64([v % self.r * self._R % self.r for v in vals],
                            self.nl)

    def from_mont(self, arr: np.ndarray) -> List[int]:
        rinv = self._rinv
        buf = arr.reshape(-1, self.nl)
        return [
            _u64_to_int(buf[i]) * rinv % self.r for i in range(buf.shape[0])
        ]

    def fft_inplace(self, arr: np.ndarray, omega: int, sinv: int = 0):
        n = arr.shape[0]
        om = _u64s(omega * self._R % self.r, self.nl)
        si = (
            _u64s(sinv * self._R % self.r, self.nl)
            if sinv
            else None
        )
        self.lib.fft_radix2(
            self._ctx,
            _ptr(arr),
            ctypes.c_long(n),
            _ptr(om),
            _ptr(si) if si is not None else None,
            _ptr(self.one_m),
        )

    def mul_arrays(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        out = np.empty_like(a)
        self.lib.fp_mul_arrays(
            self._ctx, _ptr(out), _ptr(a), _ptr(b),
            ctypes.c_long(a.shape[0]),
        )
        return out

    def add_arrays(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        out = np.empty_like(a)
        self.lib.fp_add_arrays(
            self._ctx, _ptr(out), _ptr(a), _ptr(b),
            ctypes.c_long(a.shape[0]),
        )
        return out

    def sub_arrays(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        out = np.empty_like(a)
        self.lib.fp_sub_arrays(
            self._ctx, _ptr(out), _ptr(a), _ptr(b),
            ctypes.c_long(a.shape[0]),
        )
        return out

    def mul_const(self, a: np.ndarray, k: int) -> np.ndarray:
        """Elementwise multiply by one plain-int scalar (Montgomery mul by
        k*R, so the product stays in Montgomery form)."""
        km = np.broadcast_to(
            _u64s(k % self.r * self._R % self.r, self.nl), a.shape
        ).copy()
        return self.mul_arrays(a, km)

    def h_from_evals(self, a: np.ndarray, b: np.ndarray, c: np.ndarray,
                     zinv: int) -> np.ndarray:
        out = np.empty_like(a)
        zi = _u64s(zinv * self._R % self.r, self.nl)
        self.lib.fp_mul_scalar_sub_mul(
            self._ctx, _ptr(out), _ptr(a), _ptr(b), _ptr(c), _ptr(zi),
            ctypes.c_long(a.shape[0]),
        )
        return out
