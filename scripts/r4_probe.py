"""Round-4 design probes on the real chip.

Measures the primitives that bound the round-4 MSM redesign (VERDICT round-3
"next round" items 1+2), each iterated inside ONE jit with a data dependency
so the axon tunnel latency doesn't pollute the numbers:

  gather   XLA row-gather ns/row vs row width and dtype (the claimed ~90
           ns/row floor from the round-3 ablation) — decides whether the
           sorted-stream stage-1 gather should pack rows to int8;
  sort     flat argsort(W*n) vs per-window vmapped single-array sort of
           (key<<18 | idx) packed i32 — the prologue replacement;
  chunk    Pallas kernel that walks contiguous C-row chunks of a sorted
           stream via grid BlockSpecs and tree-reduces each in VMEM (int32
           adds as a stand-in for the group law) — measures the streaming /
           per-chunk overhead of the stage-2 bucket reduce;
  mul      mont_mul_t with and without the trailing cond_sub_p (lazy
           Montgomery candidate) at L=48 and L=96.

Usage: python scripts/r4_probe.py [gather|sort|chunk|mul|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_zecale")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=1):
    """axon tunnel: block_until_ready is NOT a reliable fence — force a
    host read of the (scalar or small) result instead (bench.py:76)."""

    def fence(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[:1])

    fence(fn(*args))
    t0 = time.time()
    fence(fn(*args))
    return (time.time() - t0) / iters


def probe_gather():
    n = 1 << 18
    rng = np.random.default_rng(0)
    for rows, width, dtype in [
        (n, 144, np.int32),   # concatenated proj point, i32 limbs (round 3)
        (n, 96, np.int32),    # affine x|y i32
        (n, 96, np.int8),     # affine x|y packed bytes
        (n, 384, np.int8),    # affine x|y as bytes at i32 footprint
        (4 * n, 96, np.int32),
        (4 * n, 96, np.int8),
    ]:
        x = jnp.asarray(rng.integers(0, 127, size=(rows, width), dtype=dtype))
        idx = jnp.asarray(rng.permutation(rows).astype(np.int32))
        iters = 8

        def run(x, idx):
            def body(_, c):
                x, idx = c
                g = x[idx]
                # data-dep: rotate indices by a value from the gather
                idx = jnp.roll(idx, 1) ^ (g[0, 0] & 1).astype(jnp.int32)
                return g, idx

            x, idx = jax.lax.fori_loop(0, iters, body, (x, idx))
            return jnp.sum(x[0, :1].astype(jnp.float32)) + idx[0]

        dt = timeit(jax.jit(run), x, idx, iters=iters)
        print(
            f"gather ({rows},{width}) {np.dtype(dtype).name}: "
            f"{dt*1e3:.2f} ms = {dt/rows*1e9:.1f} ns/row, "
            f"{rows*width*np.dtype(dtype).itemsize*2/dt/1e9:.0f} GB/s"
        )


def probe_sort():
    n = 1 << 18
    W = 20
    rng = np.random.default_rng(0)
    flatk = jnp.asarray(
        rng.integers(0, 1 << 17, size=(W * n,), dtype=np.int32)
    )

    def run_flat(k):
        def body(_, k):
            o = jnp.argsort(k)
            return k ^ o.astype(jnp.int32)

        k = jax.lax.fori_loop(0, 4, body, k)
        return k[0]

    dt = timeit(jax.jit(run_flat), flatk, iters=4)
    print(f"flat argsort {W}x{n}: {dt*1e3:.1f} ms")

    wk = jnp.asarray(rng.integers(0, 1 << 30, size=(W, n), dtype=np.int32))

    def run_win(k):
        def body(_, k):
            s = jnp.sort(k, axis=1)
            return s ^ 1

        k = jax.lax.fori_loop(0, 4, body, k)
        return k[0, 0]

    dt = timeit(jax.jit(run_win), wk, iters=4)
    print(f"per-window packed sort {W}x{n} (axis=1): {dt*1e3:.1f} ms")

    def run_win_arg(k):
        def body(_, k):
            o = jnp.argsort(k, axis=1)
            return k ^ o.astype(jnp.int32)

        k = jax.lax.fori_loop(0, 4, body, k)
        return k[0, 0]

    dt = timeit(jax.jit(run_win_arg), wk, iters=4)
    print(f"per-window argsort {W}x{n} (axis=1): {dt*1e3:.1f} ms")


def probe_chunk():
    """Contiguous C-row chunks reduced in VMEM via a plain grid walk."""
    NB, C, Wd = 8192, 64, 96  # buckets, capacity, row width
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 127, size=(NB * C, Wd), dtype=np.int32)
    )

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.sum(x_ref[:].reshape(8, C, Wd), axis=1)

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(NB // 8,),
            in_specs=[
                pl.BlockSpec(
                    (8 * C, Wd), lambda i: (i, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (8, Wd), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((NB, Wd), jnp.int32),
            interpret=jax.default_backend() != "tpu",
        )(x)

    dt = timeit(jax.jit(run), x)
    rows = NB * C
    print(
        f"chunk-reduce {NB}x{C}x{Wd}: {dt*1e3:.2f} ms = "
        f"{dt/rows*1e9:.1f} ns/row, {rows*Wd*4/dt/1e9:.0f} GB/s read"
    )


def probe_mul():
    from zecale_tpu.ff import fp8, fp8t
    from zecale_tpu.ff import params as P

    for name, p, B in [
        ("bls-q L=48", P.BLS12_377_Q, 1 << 14),
        ("bw6-q L=96", P.BW6_761_Q, 1 << 13),
    ]:
        F = fp8.field8(p)
        tc = dict(F.tc)
        rng = np.random.default_rng(0)
        a = jnp.asarray(
            rng.integers(0, 200, size=(F.L, B), dtype=np.int32)
        )
        iters = 16

        def mk(lazy):
            def run(a):
                def body(_, a):
                    L = tc["L"]
                    T = fp8t.conv_ab_t(a, a, tc)
                    Tc, _ = fp8t.carry_exact_t(T, 2)
                    Tc = Tc[: 2 * L]
                    m_acc = jnp.matmul(
                        tc["toep_np_t"],
                        Tc[:L].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.int32)
                    m, _ = fp8t.carry_exact_t(m_acc, 2)
                    mp = jnp.matmul(
                        tc["toep_p_t"],
                        m[:L].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.int32)
                    Sc, _ = fp8t.carry_exact_t(Tc + mp, 2)
                    out = Sc[L : 2 * L]
                    if not lazy:
                        out = fp8t.cond_sub_p_t(out, tc)
                    return out

                a = jax.lax.fori_loop(0, iters, body, a)
                return jnp.sum(a[0, :1].astype(jnp.float32))

            return run

        for lazy in (False, True):
            dt = timeit(jax.jit(mk(lazy)), a, iters=iters)
            print(
                f"mont_mul_t {name} B={B} lazy={lazy}: "
                f"{dt*1e6:.0f} us -> {B/dt/1e6:.1f} Mmul/s"
            )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("all", "gather"):
        probe_gather()
    if which in ("all", "sort"):
        probe_sort()
    if which in ("all", "chunk"):
        probe_chunk()
    if which in ("all", "mul"):
        probe_mul()
