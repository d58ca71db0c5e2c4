"""Microbenchmarks on the real TPU chip: field-mul throughput, sort
throughput, carry costs.

Tunnel-aware methodology: the axon backend serializes results over a slow
link, so every benched computation is iterated INSIDE one jit (sequential
data dependency) and only a scalar leaves the device.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_zecale")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_loop(step, init, iters):
    """Build a jitted fn running ``step`` ``iters`` times with a data
    dependency, returning a scalar.  step: x -> x (same shape/dtype)."""

    def run(x):
        def body(_, x):
            return step(x)

        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(x[..., :1].astype(jnp.float32))

    return jax.jit(run)


def bench(name, step, init, iters=20, units=1.0, unit_name="op/s"):
    fn = timed_loop(step, init, iters)
    t0 = time.time()
    _ = float(fn(init))
    compile_s = time.time() - t0
    t0 = time.time()
    _ = float(fn(init))
    dt = (time.time() - t0) / iters
    print(
        f"{name}: {dt*1e3:.2f} ms/iter (compile {compile_s:.1f}s) "
        f"-> {units/dt/1e6:.2f} M{unit_name}"
    )
    return units / dt


def bench_fp8_mul(p_name, B, iters=20):
    from zecale_tpu.ff import fp8
    from zecale_tpu.ff import params as P

    mods = {
        "bls12-377-q": P.BLS12_377_Q,
        "bls12-377-r": P.BLS12_377_R,
        "bw6-761-q": P.BW6_761_Q,
    }
    F = fp8.field8(mods[p_name])
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 200, size=(B, F.L), dtype=np.int32))

    # constants must ride as args (axon const-folding hazard): close over a
    # jitted wrapper via bound_jit-style loop instead
    from zecale_tpu.utils.jit_utils import bound_jit

    def run(x, iters=iters):
        def body(_, x):
            return F.mont_mul(x, x)

        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(x[..., :1].astype(jnp.float32))

    fn = bound_jit([F], run)
    t0 = time.time()
    _ = float(fn(a))
    print(f"  [{p_name} L={F.L} B={B}] compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    _ = float(fn(a))
    dt = (time.time() - t0) / iters
    print(
        f"  mont_mul {p_name} B={B}: {dt*1e3:.2f} ms "
        f"-> {B/dt/1e6:.1f} M muls/s"
    )
    return B / dt


def bench_fp8_addsub(p_name, B, iters=50):
    from zecale_tpu.ff import fp8
    from zecale_tpu.ff import params as P
    from zecale_tpu.utils.jit_utils import bound_jit

    mods = {"bls12-377-q": P.BLS12_377_Q, "bw6-761-q": P.BW6_761_Q}
    F = fp8.field8(mods[p_name])
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 200, size=(B, F.L), dtype=np.int32))

    def run(x):
        def body(_, x):
            return F.add(x, x)

        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(x[..., :1].astype(jnp.float32))

    fn = bound_jit([F], run)
    _ = float(fn(a))
    t0 = time.time()
    _ = float(fn(a))
    dt = (time.time() - t0) / iters
    print(f"  add {p_name} B={B}: {dt*1e3:.3f} ms -> {B/dt/1e6:.1f} M/s")


def bench_sort(n, iters=10):
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, 1 << 20, size=(n,), dtype=np.int32))

    def step(x):
        s = jnp.sort(x)
        return s ^ 1  # perturb so next sort isn't trivial

    bench(f"sort n={n}", step, k, iters=iters, units=n, unit_name="keys/s")

    def step2(x):
        o = jnp.argsort(x)
        return x ^ o.astype(jnp.int32)

    bench(f"argsort n={n}", step2, k, iters=iters, units=n, unit_name="keys/s")


def bench_gather(n, L, iters=20):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, size=(n, L), dtype=np.int32))
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))

    def run(x):
        def body(_, x):
            return x[idx]

        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(x[0, :1].astype(jnp.float32))

    fn = jax.jit(run)
    _ = float(fn(x))
    t0 = time.time()
    _ = float(fn(x))
    dt = (time.time() - t0) / iters
    gb = n * L * 4 * 2 / 1e9
    print(f"row gather ({n},{L}): {dt*1e3:.2f} ms ({gb/dt:.0f} GB/s)")


def bench_matmul(B, K, N, iters=50):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 255, size=(B, K)).astype(np.float32))
    m = jnp.asarray((rng.random((K, N)) < 0.02).astype(np.float32))

    def run(a, m):
        def body(_, a):
            out = jnp.matmul(
                a.astype(jnp.bfloat16),
                m.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            # fold output back to input shape to chain iterations
            return jnp.pad(out, ((0, 0), (0, K - N)))

        a = jax.lax.fori_loop(0, iters, body, a)
        return jnp.sum(a[0, :1])

    fn = jax.jit(run)
    _ = float(fn(a, m))
    t0 = time.time()
    _ = float(fn(a, m))
    dt = (time.time() - t0) / iters
    fl = 2 * B * K * N
    print(
        f"bf16 matmul ({B},{K})x({K},{N}): {dt*1e3:.2f} ms "
        f"({fl/dt/1e12:.1f} TFLOP/s)"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("all", "matmul"):
        bench_matmul(1 << 14, 576, 48)
        bench_matmul(1 << 13, 2304, 96)
    if which in ("all", "add"):
        bench_fp8_addsub("bls12-377-q", 1 << 16)
    if which in ("all", "mul"):
        bench_fp8_mul("bls12-377-q", 1 << 16)
    if which in ("all", "mulbig"):
        bench_fp8_mul("bw6-761-q", 1 << 14)
    if which in ("all", "sort"):
        bench_sort(1 << 18)
    if which in ("all", "gather"):
        bench_gather(1 << 18, 48)
