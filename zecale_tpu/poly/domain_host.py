"""FFT evaluation domains over a prime scalar field (host path).

Pure-Python oracle for the TPU FFT kernels (zecale_tpu/poly/fft_tpu.py) and
workhorse for small-circuit QAP reductions.  Two domain families, matching
libfqfft's fallback chain in the reference stack (SURVEY.md section 2b,
include-dir dependency at /root/reference/libzecale/CMakeLists.txt:48):

* ``Radix2Domain`` — libfqfft ``basic_radix2_domain``: a multiplicative
  subgroup of order 2^k, k <= the field's 2-adicity.
* ``ExtendedRadix2Domain`` — libfqfft ``extended_radix2_domain``
  generalized: the union of C = 2^t disjoint cosets ``shift^j * S`` of a
  2-adic subgroup S.  This is what lets MNT6-298 (Fr 2-adicity 17) wrapper
  circuits above 2^17 constraints prove — the exact configuration the
  reference exercises via libsnark's prover on libfqfft's
  ``get_evaluation_domain`` fallback
  (/root/reference/libzecale/tests/aggregator/aggregator_dummy_test.cpp:225-228).

``domain(size, r)`` dispatches between them by the field's 2-adicity.
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

    # -- generic interface shared with ExtendedRadix2Domain -----------------
    #: block structure: a basic domain is one block of size `size`
    @property
    def num_blocks(self) -> int:
        return 1

    @property
    def block_size(self) -> int:
        return self.size

    def vanishing_on_coset_blocks_inverse(self) -> List[int]:
        """Per-block 1/Z on the evaluation coset (constant within a block)."""
        return [self.vanishing_on_coset_inverse()]

    def divide_by_z_on_coset(self, values: List[int]) -> List[int]:
        zinv = self.vanishing_on_coset_inverse()
        r = self.r
        return [v * zinv % r for v in values]

    def z_coefficients(self) -> List[tuple]:
        """Sparse coefficients of the vanishing polynomial Z(x) = x^n - 1."""
        return [(0, self.r - 1), (self.size, 1)]

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


class ExtendedRadix2Domain:
    """Union of C = 2^t disjoint cosets ``shift^j * S`` of a 2-adic subgroup
    S of order m; total size C*m.  FFT on each coset block reduces to one
    size-m radix-2 FFT of a folded-and-scaled coefficient vector:

        a(shift^j w^i) = FFT_S[ shift^{j i} * sum_u a[i+u*m] * t_j^u ][i],
        t_j := shift^{j m}

    (libfqfft ``extended_radix2_domain`` is exactly the C == 2 case.)
    Evaluation ordering is block-major: index j*m + k holds the value at
    ``shift^j * w^k``; `element`, `fft`, and `lagrange_at` all agree on it.
    """

    def __init__(self, size: int, r: int, small_m: int = 0):
        assert size and (size & (size - 1)) == 0, "domain size must be 2^k"
        k = size.bit_length() - 1
        s = two_adicity(r)
        if not small_m:
            small_m = 1 << min(k - 1, s)
        assert small_m and (small_m & (small_m - 1)) == 0
        assert small_m < size and size % small_m == 0
        assert small_m.bit_length() - 1 <= s, "field lacks required 2-adicity"
        self.size = size
        self.r = r
        self.m = small_m
        self.C = size // small_m
        self._small = Radix2Domain(small_m, r)
        self.omega = self._small.omega
        self.omega_inv = self._small.omega_inv
        self.size_inv = pow(size, r - 2, r)

        # shift: smallest x with t_j = x^(j*m) != 1 for j = 1..C-1, which
        # makes the C cosets pairwise disjoint (and the t_j distinct).
        c = quadratic_nonresidue(r)
        x = c
        while True:
            t1 = pow(x, small_m, r)
            ts = [1]
            for _ in range(self.C - 1):
                ts.append(ts[-1] * t1 % r)
            if len(set(ts)) == self.C and all(
                t != 1 for t in ts[1:]
            ):
                break
            x += 1
        self.shift = x
        self.t = ts  # t_j = shift^(j*m)

        # coset_shift g for coset FFTs: g*D disjoint from D, i.e.
        # g^m not in { t_j / t_l } = { shift^(d*m) : |d| < C }.
        forbidden = set(ts) | {pow(t, r - 2, r) for t in ts}
        g = c
        while pow(g, small_m, r) in forbidden:
            g += 1
        self.coset_shift = g

        # inverse Vandermonde over nodes v_u = t_1^u (for ifft)
        self._vinv = _inverse_vandermonde(ts, r)

    # -- evaluation points ---------------------------------------------------
    def element(self, i: int) -> int:
        j, kk = divmod(i, self.m)
        return pow(self.shift, j, self.r) * pow(self.omega, kk, self.r) % self.r

    def vanishing_at(self, x: int) -> int:
        r = self.r
        xm = pow(x, self.m, r)
        z = 1
        for t in self.t:
            z = z * ((xm - t) % r) % r
        return z

    def z_coefficients(self) -> List[tuple]:
        """Sparse coefficients of Z(x) = prod_j (x^m - t_j)."""
        r = self.r
        # polynomial in y = x^m: prod_j (y - t_j)
        poly = [1]
        for t in self.t:
            nxt = [0] * (len(poly) + 1)
            for i, cf in enumerate(poly):
                nxt[i + 1] = (nxt[i + 1] + cf) % r
                nxt[i] = (nxt[i] - cf * t) % r
            poly = nxt
        return [(i * self.m, cf) for i, cf in enumerate(poly) if cf]

    # -- FFT -----------------------------------------------------------------
    def fft(self, coeffs: List[int]) -> List[int]:
        r, m, C = self.r, self.m, self.C
        assert len(coeffs) == self.size
        out: List[int] = []
        for j in range(C):
            tj = self.t[j]
            folded = [v % r for v in coeffs[:m]]
            tju = 1
            for u in range(1, C):
                tju = tju * tj % r
                blk = coeffs[u * m : (u + 1) * m]
                for i in range(m):
                    folded[i] = (folded[i] + blk[i] * tju) % r
            sj = pow(self.shift, j, r)
            g = 1
            for i in range(m):
                folded[i] = folded[i] * g % r
                g = g * sj % r
            out.extend(self._small._fft(folded, self.omega))
        return out

    def ifft(self, evals: List[int]) -> List[int]:
        r, m, C = self.r, self.m, self.C
        assert len(evals) == self.size
        # per-block inverse FFT, then unscale by shift^{-j i}
        ys = []
        for j in range(C):
            blk = self._small.ifft(evals[j * m : (j + 1) * m])
            sj_inv = pow(pow(self.shift, j, r), r - 2, r)
            g = 1
            y = [0] * m
            for i in range(m):
                y[i] = blk[i] * g % r
                g = g * sj_inv % r
            ys.append(y)
        # per-index Vandermonde solve: x_u = sum_j Vinv[u][j] y_j
        out = [0] * self.size
        for u in range(C):
            row = self._vinv[u]
            seg = out
            base = u * m
            for i in range(m):
                acc = 0
                for j in range(C):
                    acc += row[j] * ys[j][i]
                seg[base + i] = acc % r
        return out

    # -- coset variants ------------------------------------------------------
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

    @property
    def num_blocks(self) -> int:
        return self.C

    @property
    def block_size(self) -> int:
        return self.m

    def vanishing_on_coset_blocks_inverse(self) -> List[int]:
        """1/Z(g * shift^j * w^i) — constant within each coset block:
        Z there equals prod_l (g^m t_j - t_l)."""
        r = self.r
        gm = pow(self.coset_shift, self.m, r)
        out = []
        for tj in self.t:
            z = 1
            for tl in self.t:
                z = z * ((gm * tj - tl) % r) % r
            out.append(pow(z, r - 2, r))
        return out

    def divide_by_z_on_coset(self, values: List[int]) -> List[int]:
        r, m = self.r, self.m
        zinvs = self.vanishing_on_coset_blocks_inverse()
        out = [0] * self.size
        for j, zi in enumerate(zinvs):
            for i in range(j * m, (j + 1) * m):
                out[i] = values[i] * zi % r
        return out

    # -- Lagrange ------------------------------------------------------------
    def lagrange_at(self, tau: int) -> List[int]:
        """L_x(tau) = Z(tau) * x / (m * t_j * P_j * (tau - x)) for x in coset
        j, with P_j = prod_{l != j} (t_j - t_l)  (from Z'(x) = m x^{m-1} P_j
        at points of coset j)."""
        r, m, C, n = self.r, self.m, self.C, self.size
        z = self.vanishing_at(tau)
        if z == 0:
            out = [0] * n
            for i in range(n):
                if (tau - self.element(i)) % r == 0:
                    out[i] = 1
            return out
        pj = []
        for j in range(C):
            p = 1
            for l in range(C):
                if l != j:
                    p = p * ((self.t[j] - self.t[l]) % r) % r
            pj.append(p)
        xs = [0] * n
        denoms = [0] * n
        for j in range(C):
            sj = pow(self.shift, j, r)
            x = sj
            mj = m * self.t[j] % r * pj[j] % r
            for i in range(m):
                idx = j * m + i
                xs[idx] = x
                denoms[idx] = mj * ((tau - x) % r) % r
                x = x * self.omega % r
        # batch invert denominators
        prefix = [1] * (n + 1)
        for i, d in enumerate(denoms):
            prefix[i + 1] = prefix[i] * d % r
        inv_all = pow(prefix[n], r - 2, r)
        invs = [0] * n
        for i in range(n - 1, -1, -1):
            invs[i] = prefix[i] * inv_all % r
            inv_all = inv_all * denoms[i] % r
        return [z * xs[i] % r * invs[i] % r for i in range(n)]


def _inverse_vandermonde(nodes: List[int], r: int) -> List[List[int]]:
    """Inverse of V[j][u] = nodes[u]^j over F_r (nodes distinct, small)."""
    C = len(nodes)
    # Lagrange interpolation through (nodes[u], e_u): column u of Vinv holds
    # the coefficients of l_u(y) = prod_{v != u} (y - nodes[v])/(nodes[u]-...)
    vinv = [[0] * C for _ in range(C)]
    for u in range(C):
        num = [1]
        denom = 1
        for v in range(C):
            if v == u:
                continue
            nxt = [0] * (len(num) + 1)
            for i, cf in enumerate(num):
                nxt[i + 1] = (nxt[i + 1] + cf) % r
                nxt[i] = (nxt[i] - cf * nodes[v]) % r
            num = nxt
            denom = denom * ((nodes[u] - nodes[v]) % r) % r
        dinv = pow(denom, r - 2, r)
        for i in range(C):
            vinv[u][i] = num[i] * dinv % r
    return vinv


#: test hook: force a specific domain object for a (size, r) key (used by
#: tests to exercise extended domains without 2^17-constraint circuits)
_override: dict = {}


@functools.lru_cache(maxsize=None)
def _domain_cached(size: int, r: int):
    k = size.bit_length() - 1
    if k <= two_adicity(r):
        return Radix2Domain(size, r)
    return ExtendedRadix2Domain(size, r)


def domain(size: int, r: int):
    """libfqfft get_evaluation_domain parity: basic radix-2 when the field's
    2-adicity allows it, extended (coset-union) domain above it."""
    if _override:
        d = _override.get((size, r))
        if d is not None:
            return d
    return _domain_cached(size, r)


def next_power_of_two(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p
