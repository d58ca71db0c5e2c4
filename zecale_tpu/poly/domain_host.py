"""Radix-2 FFT evaluation domains over a prime scalar field (host path).

Pure-Python oracle for the TPU FFT kernels (zecale_tpu/poly/fft_tpu.py) and
workhorse for small-circuit QAP reductions.  Equivalent role to libfqfft's
``basic_radix2_domain`` in the reference stack (SURVEY.md section 2b).
"""

from __future__ import annotations

import functools
from typing import List


def _is_qnr(x: int, r: int) -> bool:
    return pow(x, (r - 1) // 2, r) == r - 1


@functools.lru_cache(maxsize=None)
def quadratic_nonresidue(r: int) -> int:
    x = 2
    while not _is_qnr(x, r):
        x += 1
    return x


@functools.lru_cache(maxsize=None)
def two_adicity(r: int) -> int:
    s = 0
    m = r - 1
    while m % 2 == 0:
        m //= 2
        s += 1
    return s


class Radix2Domain:
    """Multiplicative subgroup of F_r of order 2^k with FFT/iFFT."""

    def __init__(self, size: int, r: int):
        assert size and (size & (size - 1)) == 0, "domain size must be 2^k"
        k = size.bit_length() - 1
        assert k <= two_adicity(r), "field lacks required 2-adicity"
        self.size = size
        self.r = r
        c = quadratic_nonresidue(r)
        # c^((r-1)/2) == -1, so c^((r-1)/size) has exact order `size`.
        self.omega = pow(c, (r - 1) // size, r)
        self.omega_inv = pow(self.omega, r - 2, r)
        self.size_inv = pow(size, r - 2, r)
        #: multiplicative coset shift (any QNR is outside every 2^j subgroup)
        self.coset_shift = c

    # -- vanishing polynomial Z(x) = x^size - 1 -----------------------------
    def vanishing_at(self, x: int) -> int:
        return (pow(x, self.size, self.r) - 1) % self.r

    def element(self, i: int) -> int:
        return pow(self.omega, i, self.r)

    # -- FFT ---------------------------------------------------------------
    def _fft(self, values: List[int], omega: int) -> List[int]:
        r = self.r
        n = self.size
        assert len(values) == n
        a = list(values)
        # bit reversal
        j = 0
        for i in range(1, n):
            bit = n >> 1
            while j & bit:
                j ^= bit
                bit >>= 1
            j |= bit
            if i < j:
                a[i], a[j] = a[j], a[i]
        length = 2
        while length <= n:
            wlen = pow(omega, n // length, r)
            half = length // 2
            for start in range(0, n, length):
                w = 1
                for i in range(start, start + half):
                    u = a[i]
                    v = a[i + half] * w % r
                    a[i] = (u + v) % r
                    a[i + half] = (u - v) % r
                    w = w * wlen % r
            length <<= 1
        return a

    def fft(self, coeffs: List[int]) -> List[int]:
        """coefficients -> evaluations on the domain."""
        return self._fft(coeffs, self.omega)

    def ifft(self, evals: List[int]) -> List[int]:
        """evaluations on the domain -> coefficients."""
        out = self._fft(evals, self.omega_inv)
        return [v * self.size_inv % self.r for v in out]

    # -- coset variants -----------------------------------------------------
    def coset_fft(self, coeffs: List[int]) -> List[int]:
        r = self.r
        g = 1
        shifted = []
        for c in coeffs:
            shifted.append(c * g % r)
            g = g * self.coset_shift % r
        return self.fft(shifted)

    def coset_ifft(self, evals: List[int]) -> List[int]:
        r = self.r
        coeffs = self.ifft(evals)
        ginv = pow(self.coset_shift, r - 2, r)
        g = 1
        out = []
        for c in coeffs:
            out.append(c * g % r)
            g = g * ginv % r
        return out

    def vanishing_on_coset_inverse(self) -> int:
        """1 / Z(shift * w^i): constant across the coset."""
        z = (pow(self.coset_shift, self.size, self.r) - 1) % self.r
        return pow(z, self.r - 2, self.r)

    # -- Lagrange -----------------------------------------------------------
    def lagrange_at(self, tau: int) -> List[int]:
        """All Lagrange-basis values L_i(tau), i in [0, size)."""
        r = self.r
        n = self.size
        z = self.vanishing_at(tau)
        if z == 0:
            # tau on the domain: L_i = delta_i
            out = [0] * n
            w = 1
            for i in range(n):
                if (tau - w) % r == 0:
                    out[i] = 1
                w = w * self.omega % r
            return out
        # L_i(tau) = Z(tau) * w^i / (n * (tau - w^i)) -- batch inversion
        denoms = []
        w = 1
        for i in range(n):
            denoms.append((tau - w) % r)
            w = w * self.omega % r
        # batch invert
        prefix = [1] * (n + 1)
        for i, d in enumerate(denoms):
            prefix[i + 1] = prefix[i] * d % r
        inv_all = pow(prefix[n], r - 2, r)
        invs = [0] * n
        for i in range(n - 1, -1, -1):
            invs[i] = prefix[i] * inv_all % r
            inv_all = inv_all * denoms[i] % r
        zn = z * self.size_inv % r
        out = []
        w = 1
        for i in range(n):
            out.append(zn * w % r * invs[i] % r)
            w = w * self.omega % r
        return out


@functools.lru_cache(maxsize=None)
def domain(size: int, r: int) -> Radix2Domain:
    return Radix2Domain(size, r)


def next_power_of_two(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p
