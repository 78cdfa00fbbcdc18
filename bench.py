#!/usr/bin/env python
"""Headline benchmark: batched f32 complex FFT vs jnp.fft on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value = geometric-mean speedup of the flagship kernel over jnp.fft across
the BASELINE.json N sweep (N=16-4096). Timing = seconds per forward+inverse
roundtrip measured as the SLOPE between two lax.fori_loop chain lengths
(cancels the axon tunnel's ~28 ms fixed dispatch/sync overhead; see
watfft_tpu/bench/harness.py:time_chain). Each side runs in its preferred
layout with split-plane I/O: ours time-major [n, batch] (batch on lanes),
jnp.fft batch-major [batch, n].

vs_baseline = value / 2.0 (the BASELINE target is >=2x jnp.fft per chip).
Details go to stderr + benchmarks/results/headline.latest.json.
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SIZES = [16, 64, 256, 1024, 2048, 4096]
TOTAL_ELEMS = 1 << 21


def main(full: bool = False) -> None:
    import jax
    import jax.numpy as jnp
    from watfft_tpu.api import FFTContext
    from watfft_tpu.ops.pallas_stockham import stockham_fft_nb
    from watfft_tpu.bench.harness import save_results, BenchResult, time_chain

    rng = np.random.default_rng(12345)
    results = []
    speedups = []

    for n in SIZES:
        b = max(128, TOTAL_ELEMS // n)
        host_re = rng.uniform(-1, 1, (b, n)).astype(np.float32)
        host_im = rng.uniform(-1, 1, (b, n)).astype(np.float32)
        xre = jnp.asarray(host_re)
        xim = jnp.asarray(host_im)
        xre_t = jnp.asarray(np.ascontiguousarray(host_re.T))
        xim_t = jnp.asarray(np.ascontiguousarray(host_im.T))

        def jstep(c):
            a, bb = c
            z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
            return z.real, z.imag

        # conservative baseline: best (fastest) of two independent
        # measurements — run-to-run jitter on the tunnel can be 2-4x and
        # should never inflate our reported speedup
        t_base = min(time_chain(jstep, (xre, xim)),
                     time_chain(jstep, (xre, xim)))

        ours_name = "stockham-pallas"
        try:
            def pstep(c):
                a, bb = c
                a, bb = stockham_fft_nb(a, bb, inverse=False)
                return stockham_fft_nb(a, bb, inverse=True)
            # median-of-three on our side: best-of would cherry-pick jitter
            # in OUR favor (one run showed an unphysical 18x), median is
            # robust in both directions; the baseline keeps best-of-two so
            # jitter can only shrink the reported speedup
            t_ours = sorted(time_chain(pstep, (xre_t, xim_t))
                            for _ in range(3))[1]
            # physical floor: a roundtrip moves 4 full plane arrays through
            # HBM twice; nothing real beats 2 TB/s. Degenerate slopes
            # (tunnel jitter) get clamped so no reported number is
            # impossible.
            floor = (4 * 2 * xre_t.size * 4) / 2e12
            t_ours = max(t_ours, floor)
        except Exception as e:
            print(f"  n={n}: pallas failed ({str(e)[:80]}), using fourstep",
                  file=sys.stderr)
            ours_name = "fourstep-mxu"
            ctx = FFTContext(n, "float32")
            ft, it_ = ctx._fwd_tables, ctx._inv_tables

            def fstep(c):
                a, bb = c
                a, bb = ctx._planes_fn(a, bb, ft)
                return ctx._planes_fn(a, bb, it_)
            t_ours = time_chain(fstep, (xre, xim))

        speedups.append(t_base / t_ours)
        # ops/s here counts single transforms: one roundtrip = 2 transforms
        results.append(BenchResult(name=f"watfft/{ours_name}/f32/n{n}",
                                   ops_per_sec=2 * b / t_ours, cv=0.0,
                                   batch=b, items_per_call=2 * b, samples=[]))
        results.append(BenchResult(name=f"jnp.fft/f32/n{n}",
                                   ops_per_sec=2 * b / t_base, cv=0.0,
                                   batch=b, items_per_call=2 * b, samples=[]))
        print(f"  n={n:<6} ours({ours_name})={2*b/t_ours:,.0f}/s  "
              f"jnp={2*b/t_base:,.0f}/s  x{speedups[-1]:.2f}", file=sys.stderr)

    geomean = math.exp(sum(map(math.log, speedups)) / len(speedups))

    if full:
        from watfft_tpu.ops.pallas_rfft import rfft_nb, irfft_nb
        for n in (256, 1024, 4096):
            b = max(128, TOTAL_ELEMS // n)
            xr_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))

            def rstep(c):
                re, im = rfft_nb(c)
                return irfft_nb(re, im)
            t_r = time_chain(rstep, xr_t)

            xr = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

            def jrstep(c):
                return jnp.fft.irfft(jnp.fft.rfft(c), n=n)
            t_jr = time_chain(jrstep, xr)
            print(f"  [real] n={n:<6} ours={2*b/t_r:,.0f}/s "
                  f"jnp={2*b/t_jr:,.0f}/s x{t_jr/t_r:.2f}", file=sys.stderr)
            results.append(BenchResult(name=f"watfft/rfft-pallas/f32/n{n}",
                                       ops_per_sec=2 * b / t_r, cv=0.0,
                                       batch=b, items_per_call=2 * b, samples=[]))
            results.append(BenchResult(name=f"jnp.fft/real/f32/n{n}",
                                       ops_per_sec=2 * b / t_jr, cv=0.0,
                                       batch=b, items_per_call=2 * b, samples=[]))

    if full:
        # BASELINE config 4: STFT-style workload — 4096 independent N=1024
        # real transforms packed along the lane axis.
        from watfft_tpu.ops.pallas_rfft import rfft_nb
        n, b = 1024, 4096
        xr_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))

        def sstep(c):
            re, im = rfft_nb(c)
            # keep carry shape [n, b]: drop the extra bin row
            return jnp.concatenate([re[:-1], im[:-1]], axis=0)[:n]
        t_s = time_chain(sstep, xr_t)
        xr = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

        def jstft(c):
            y = jnp.fft.rfft(c)
            return jnp.concatenate([y.real[:, :-1], y.imag[:, :-1]], axis=1)[:, :n]
        t_js = time_chain(jstft, xr)
        print(f"  [stft-4096x1024] ours={b/t_s:,.0f}/s jnp={b/t_js:,.0f}/s "
              f"x{t_js/t_s:.2f}", file=sys.stderr)
        results.append(BenchResult(name="watfft/stft-workload/f32/n1024",
                                   ops_per_sec=b / t_s, cv=0.0, batch=b,
                                   items_per_call=b, samples=[]))
        results.append(BenchResult(name="jnp.fft/stft-workload/f32/n1024",
                                   ops_per_sec=b / t_js, cv=0.0, batch=b,
                                   items_per_call=b, samples=[]))

        # BASELINE config 5: large-N four-step
        from watfft_tpu.ops.large import fft_large
        for log in (16, 18, 20):
            nn = 1 << log
            xs = jnp.asarray(rng.uniform(-1, 1, nn).astype(np.float32))
            ys = jnp.asarray(rng.uniform(-1, 1, nn).astype(np.float32))

            def lstep(c):
                a, bb = c
                a, bb = fft_large(a, bb, inverse=False)
                return fft_large(a, bb, inverse=True)
            t_l = sorted(time_chain(lstep, (xs, ys), r1=16, r2=96)
                         for _ in range(3))[1]

            def jlstep(c):
                a, bb = c
                z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
                return z.real, z.imag
            t_jl = min(time_chain(jlstep, (xs, ys), r1=16, r2=96)
                       for _ in range(2))
            print(f"  [large] 2^{log} ours={t_l*1e6:,.0f}us "
                  f"jnp={t_jl*1e6:,.0f}us x{t_jl/t_l:.2f}", file=sys.stderr)
            results.append(BenchResult(name=f"watfft/fft-large/f32/n{nn}",
                                       ops_per_sec=2 / t_l, cv=0.0, batch=1,
                                       items_per_call=2, samples=[]))
            results.append(BenchResult(name=f"jnp.fft/fft-large/f32/n{nn}",
                                       ops_per_sec=2 / t_jl, cv=0.0, batch=1,
                                       items_per_call=2, samples=[]))

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
