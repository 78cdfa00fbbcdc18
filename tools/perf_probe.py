"""Kernel perf probe: jnp.fft vs fourstep-jnp vs pallas-stockham on chip.

Measurement method (axon tunnel): a timed call carries ~28 ms of fixed
RPC/sync overhead, and unrolled op chains get algebraically folded by XLA.
So each benchmark runs R forward+inverse roundtrips inside a
lax.fori_loop (runtime loop, no folding, one compile) with full-array
readback as the sync, and the per-roundtrip cost is the SLOPE between two
loop lengths: (t(R2) - t(R1)) / (R2 - R1).

Usage: python tools/perf_probe.py [sizes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

R1, R2 = 32, 160


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf[:1, :1])


def time_chain(step, args, r1=R1, r2=R2, reps=3):
    """step: (carry)->(carry). Seconds per iteration = median-of-3 slopes
    (single slopes can degenerate to ~0 or negative under tunnel jitter)."""
    from watfft_tpu.bench.harness import time_chain as _tc
    slopes = sorted(_tc(step, args, r1=r1, r2=r2, reps=reps)
                    for _ in range(3))
    return slopes[1]


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [16, 64, 256, 1024, 2048, 4096]
    from watfft_tpu.api import FFTContext
    from watfft_tpu.ops.pallas_stockham import stockham_fft_nb

    rng = np.random.default_rng(0)
    total = 1 << 21
    print(f"{'n':>6} {'batch':>7} {'jnp.fft':>9} {'fourstep':>9} {'pallas':>9}"
          f"   us/roundtrip-batch (fwd+inv); speedup = jnp/pallas", flush=True)
    for n in sizes:
        b = max(128, total // n)
        xre = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
        xim = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
        xre_t = jnp.asarray(np.ascontiguousarray(np.asarray(xre).T))
        xim_t = jnp.asarray(np.ascontiguousarray(np.asarray(xim).T))

        def jstep(c):
            a, bb = c
            z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
            return z.real, z.imag

        t_base = time_chain(jstep, (xre, xim))

        ctx = FFTContext(n, "float32")
        ft, it_ = ctx._fwd_tables, ctx._inv_tables

        def fstep(c):
            a, bb = c
            a, bb = ctx._planes_fn(a, bb, ft)
            return ctx._planes_fn(a, bb, it_)

        t_four = time_chain(fstep, (xre, xim))

        try:
            def pstep(c):
                a, bb = c
                a, bb = stockham_fft_nb(a, bb, inverse=False)
                return stockham_fft_nb(a, bb, inverse=True)
            t_pal = time_chain(pstep, (xre_t, xim_t))
        except Exception as e:
            print(f"   pallas failed: {str(e)[:90]}", flush=True)
            t_pal = float("nan")
        sp = t_base / t_pal if t_pal == t_pal else float("nan")
        print(f"{n:>6} {b:>7} {t_base*1e6:>9.1f} {t_four*1e6:>9.1f} "
              f"{t_pal*1e6:>9.1f}   x{sp:.2f}", flush=True)


if __name__ == "__main__":
    main()
