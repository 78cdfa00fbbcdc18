#!/usr/bin/env python
"""Exp 42 probe: bf16 COMPUTE tier (butterflies in bfloat16 end-to-end).

Measures bf16-resident roundtrip chains (carry stays bf16 — the tier's
claimed home workload) under three configurations, interleaved:
  f32:   f32 planes, f32 butterflies (the accuracy tier, for scale)
  intrp: bf16 planes, f32 butterflies (the interop tier, Exp 26)
  comp:  bf16 planes, bf16 butterflies (config.BF16_COMPUTE)

Usage: python tools/probe_bf16_compute.py [--reps 5] [--sizes 256,1024,4096]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu import config
from watfft_tpu.bench.harness import time_chain
from watfft_tpu.ops import pallas_stockham as ps

TOTAL = 1 << 21


def med(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sizes = [256, 1024, 4096]
    if "--sizes" in sys.argv:
        sizes = [int(s) for s in
                 sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    rng = np.random.default_rng(42)

    def run(xr, xi, compute):
        config.BF16_COMPUTE = compute
        re, im = ps._stockham_impl(xr, xi, False)
        return ps._stockham_impl(re, im, True)

    for n in sizes:
        b = max(128, TOTAL // n)
        xr = rng.uniform(-1, 1, (n, b)).astype(np.float32)
        xi = rng.uniform(-1, 1, (n, b)).astype(np.float32)
        f32a = (jnp.asarray(xr), jnp.asarray(xi))
        bfa = (jnp.asarray(xr, jnp.bfloat16), jnp.asarray(xi, jnp.bfloat16))

        # correctness on chip first
        cr, ci = run(*bfa, True)
        ref = np.fft.ifft(np.fft.fft(
            xr.astype(np.float64) + 1j * xi.astype(np.float64), axis=0),
            axis=0)
        err = np.max(np.abs(np.asarray(cr.astype(jnp.float32)) - ref.real))
        cands = {
            "f32": (lambda c: run(c[0], c[1], False), f32a),
            "intrp": (lambda c: run(c[0], c[1], False), bfa),
            "comp": (lambda c: run(c[0], c[1], True), bfa),
        }
        ts = {k: [] for k in cands}
        for _ in range(reps):
            for k, (step, args) in cands.items():
                ts[k].append(time_chain(step, args))
        t = {k: med(v) for k, v in ts.items()}
        r_cf = med([a_ / b_ for b_, a_ in zip(ts["comp"], ts["f32"])])
        r_ci = med([a_ / b_ for b_, a_ in zip(ts["comp"], ts["intrp"])])
        print(f"n={n:<6} f32={t['f32']*1e6:8.1f}us intrp={t['intrp']*1e6:8.1f}us "
              f"comp={t['comp']*1e6:8.1f}us  comp-vs-f32 x{r_cf:.2f} "
              f"comp-vs-intrp x{r_ci:.2f}  err={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
