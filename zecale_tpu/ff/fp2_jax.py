"""Batched quadratic-extension arithmetic Fq2 = Fq[u]/(u^2 - nr) on the JAX
path (needed for BLS12-377 G2 kernels).  Elements: (..., 2, L) int32 limbs,
both coefficients in Montgomery form.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from . import fp_jax
from . import limb as lb


class Fp2TPU:
    """See FpTPU.consts/bound for the constant-binding protocol."""

    def __init__(self, p: int, nr: int):
        self.base = fp_jax.FpTPU(p)
        self.p = p
        self.nr = nr % p
        # nr in Montgomery form for the reduction multiply
        import numpy as np

        mp = lb.mont_params(p)
        self.nr_mont = jnp.asarray(
            lb.to_limbs(self.nr * mp.r_mod_p % p, self.base.L).astype(np.int32)
        )
        self.L = self.base.L

    def consts(self):
        return {"base": self.base.consts(), "nr": self.nr_mont}

    import contextlib as _ctx

    @_ctx.contextmanager
    def bound(self, c):
        old_nr = self.nr_mont
        self.nr_mont = c["nr"]
        try:
            with self.base.bound(c["base"]):
                yield
        finally:
            self.nr_mont = old_nr

    # elements: (..., 2, L)
    def zero(self, shape=()):
        return jnp.zeros((*shape, 2, self.L), dtype=jnp.int32)

    def one_mont_elem(self):
        """(1, 0) in Montgomery form as a (2, L) element (derived from the
        bound base-field constant)."""
        one = self.base.one_mont
        return jnp.stack([one, jnp.zeros_like(one)], axis=0)

    def add(self, a, b):
        return jnp.stack(
            [
                self.base.add(a[..., 0, :], b[..., 0, :]),
                self.base.add(a[..., 1, :], b[..., 1, :]),
            ],
            axis=-2,
        )

    def sub(self, a, b):
        return jnp.stack(
            [
                self.base.sub(a[..., 0, :], b[..., 0, :]),
                self.base.sub(a[..., 1, :], b[..., 1, :]),
            ],
            axis=-2,
        )

    def neg(self, a):
        return jnp.stack(
            [self.base.neg(a[..., 0, :]), self.base.neg(a[..., 1, :])],
            axis=-2,
        )

    def double(self, a):
        return self.add(a, a)

    def _mul_nr(self, x):
        return self.base.mont_mul(x, jnp.broadcast_to(self.nr_mont, x.shape))

    def mont_mul(self, a, b):
        B = self.base
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t0 = B.mont_mul(a0, b0)
        t1 = B.mont_mul(a1, b1)
        mid = B.sub(
            B.sub(B.mont_mul(B.add(a0, a1), B.add(b0, b1)), t0), t1
        )
        c0 = B.add(t0, self._mul_nr(t1))
        return jnp.stack([c0, mid], axis=-2)

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def select(self, cond, if_true, if_false):
        return jnp.where(cond[..., None, None], if_true, if_false)

    # -- host conversion -----------------------------------------------------
    def pack(self, tuples, mont: bool = True):
        """List of host Fq2 tuples (c0, c1) -> (N, 2, L)."""
        flat = []
        for c0, c1 in tuples:
            flat.append(c0)
            flat.append(c1)
        arr = self.base.pack(flat, mont=mont)
        return arr.reshape(len(tuples), 2, self.L)

    def unpack(self, arr, mont: bool = True):
        n = arr.shape[0]
        flat = self.base.unpack(arr.reshape(n * 2, self.L), mont=mont)
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(n)]


@functools.lru_cache(maxsize=None)
def bls12_377_fq2() -> Fp2TPU:
    from . import params as P

    return Fp2TPU(P.BLS12_377_Q, P.BLS12_377_FQ2_QNR)
