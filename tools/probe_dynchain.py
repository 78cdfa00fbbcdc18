"""Probe: dynamic trip-count fori_loop chains vs static-r chains.

Motivation (round 4, VERDICT #1): time_chain jit-compiles a fresh chain per
(step, r) pair; with 3-4 distinct lengths per call and fresh closures per
rep, compiles dominate bench wall-clock (BENCH_r03 rc=124). If a dynamic-r
chain (r as a traced scalar -> while_loop lowering) yields the same slope,
one compile per side covers every length.

Also probes whether jax_compilation_cache_dir works on the axon backend.
"""
import sys, time, functools
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from watfft_tpu.ops.pallas_stockham import stockham_fft_nb

rng = np.random.default_rng(0)
n, b = 1024, 2048
xre = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
xim = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))


def pstep(c):
    a, bb = c
    a, bb = stockham_fft_nb(a, bb, inverse=False)
    return stockham_fft_nb(a, bb, inverse=True)


def jstep(c):
    a, bb = c
    z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
    return z.real, z.imag


def timed_factory_static(step, args):
    @functools.partial(jax.jit, static_argnames=("r",))
    def chain(carry, r):
        return jax.lax.fori_loop(0, r, lambda i, c: step(c), carry)

    def timed(r):
        t0 = time.perf_counter()
        out = chain(args, r=r)
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf[(slice(0, 1),) * leaf.ndim])
        return time.perf_counter() - t0
    return timed


def timed_factory_dyn(step, args):
    @jax.jit
    def chain(carry, r):
        return jax.lax.fori_loop(0, r, lambda i, c: step(c), carry)

    def timed(r):
        t0 = time.perf_counter()
        out = chain(args, jnp.int32(r))
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf[(slice(0, 1),) * leaf.ndim])
        return time.perf_counter() - t0
    return timed


for name, step in (("pallas", pstep), ("jnp", jstep)):
    for kind, fac in (("static", timed_factory_static),
                      ("dyn", timed_factory_dyn)):
        t0 = time.perf_counter()
        timed = fac(step, (xre, xim))
        timed(32)  # compile (+ first extra length for static)
        c1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        timed(160)
        c2 = time.perf_counter() - t0
        # slope, 3 reps
        slopes = []
        for _ in range(3):
            t1 = timed(32)
            t2 = timed(160)
            slopes.append((t2 - t1) / 128)
        med = sorted(slopes)[1]
        print(f"{name:6s} {kind:6s} compile32={c1:6.2f}s compile160={c2:6.2f}s "
              f"slope={med*1e6:8.2f}us/iter  all={[f'{s*1e6:.2f}' for s in slopes]}")
