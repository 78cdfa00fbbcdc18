#!/usr/bin/env python
"""Headline benchmark: batched f32 complex FFT vs jnp.fft on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value = geometric-mean speedup of the flagship kernel over jnp.fft across the
BASELINE.json N sweep (N=16-4096), measured as forward+inverse roundtrip
chains (R roundtrips inside one jit) so the axon tunnel's ~6 ms per-dispatch
overhead cancels out of the comparison. Each side runs in its preferred
layout with split-plane I/O: ours time-major [n, batch] (batch on lanes),
jnp.fft batch-major [batch, n] (transform on the minor axis).

vs_baseline = value / 2.0 (the BASELINE target is >=2x jnp.fft per chip).
Details go to stderr + benchmarks/results/headline.latest.json.
"""

import json
import math
import sys
import time

import numpy as np

SIZES = [16, 64, 256, 1024, 2048, 4096]
TOTAL_ELEMS = 1 << 21
ROUNDTRIPS = 16


def _timeit(fn, *args, reps=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main(full: bool = False) -> None:
    import jax
    import jax.numpy as jnp
    from watfft_tpu.api import FFTContext
    from watfft_tpu.ops.pallas_stockham import stockham_fft_nb
    from watfft_tpu.bench.harness import save_results, BenchResult

    rng = np.random.default_rng(12345)
    results = []
    speedups = []
    R = ROUNDTRIPS

    for n in SIZES:
        b = max(128, TOTAL_ELEMS // n)
        host_re = rng.uniform(-1, 1, (b, n)).astype(np.float32)
        host_im = rng.uniform(-1, 1, (b, n)).astype(np.float32)
        xre = jnp.asarray(host_re)
        xim = jnp.asarray(host_im)
        xre_t = jnp.asarray(np.ascontiguousarray(host_re.T))
        xim_t = jnp.asarray(np.ascontiguousarray(host_im.T))

        @jax.jit
        def jfft_chain(a, bb):
            z = a + 1j * bb
            for _ in range(R):
                z = jnp.fft.ifft(jnp.fft.fft(z))
            return z.real, z.imag

        t_base = _timeit(jfft_chain, xre, xim) / (2 * R)

        ours_name = "stockham-pallas"
        try:
            @jax.jit
            def pal_chain(a, bb):
                for _ in range(R):
                    a, bb = stockham_fft_nb(a, bb, inverse=False)
                    a, bb = stockham_fft_nb(a, bb, inverse=True)
                return a, bb
            t_ours = _timeit(pal_chain, xre_t, xim_t) / (2 * R)
        except Exception as e:
            print(f"  n={n}: pallas failed ({str(e)[:80]}), using fourstep",
                  file=sys.stderr)
            ours_name = "fourstep-mxu"
            ctx = FFTContext(n, "float32")
            ft, it_ = ctx._fwd_tables, ctx._inv_tables

            @jax.jit
            def four_chain(a, bb):
                for _ in range(R):
                    a, bb = ctx._planes_fn(a, bb, ft)
                    a, bb = ctx._planes_fn(a, bb, it_)
                return a, bb
            t_ours = _timeit(four_chain, xre, xim) / (2 * R)

        speedups.append(t_base / t_ours)
        results.append(BenchResult(name=f"watfft/{ours_name}/f32/n{n}",
                                   ops_per_sec=b / t_ours, cv=0.0,
                                   batch=2 * R, items_per_call=b, samples=[]))
        results.append(BenchResult(name=f"jnp.fft/f32/n{n}",
                                   ops_per_sec=b / t_base, cv=0.0,
                                   batch=2 * R, items_per_call=b, samples=[]))
        print(f"  n={n:<6} ours({ours_name})={b/t_ours:,.0f}/s  "
              f"jnp={b/t_base:,.0f}/s  x{speedups[-1]:.2f}", file=sys.stderr)

    geomean = math.exp(sum(map(math.log, speedups)) / len(speedups))

    try:
        path = save_results("headline", results)
        print(f"saved: {path}", file=sys.stderr)
    except Exception as e:
        print(f"save failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "batched f32 complex FFT geomean speedup vs jnp.fft (N=16-4096)",
        "value": round(geomean, 4),
        "unit": "x",
        "vs_baseline": round(geomean / 2.0, 4),
    }))


if __name__ == "__main__":
    main(full="--full" in sys.argv)
