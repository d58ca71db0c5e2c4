"""Jit helpers for the constants-as-arguments protocol.

The axon XLA-TPU compiler hangs (pathological constant folding) when large
per-modulus constants are embedded in traced graphs, so every hot kernel is
wrapped with bound_jit: the binder objects' consts() pytrees are passed as
the first jit argument and rebound (binder.bound) for the duration of the
trace.
"""

from __future__ import annotations

import functools
from contextlib import ExitStack

import jax


def bound_jit(binders, fn, static_argnums=()):
    """jax.jit(fn) with each binder's constants passed as arguments.

    ``binders``: objects exposing consts() -> pytree and bound(pytree)
    context manager.  ``fn`` is traced with the binders bound to tracer
    constants; at call time the real constant arrays are forwarded.
    """
    shifted_static = tuple(s + 1 for s in static_argnums)

    @functools.partial(jax.jit, static_argnums=shifted_static)
    def inner(cs, *args):
        with ExitStack() as st:
            for b, c in zip(binders, cs):
                st.enter_context(b.bound(c))
            return fn(*args)

    def call(*args):
        return inner([b.consts() for b in binders], *args)

    return call
