#!/usr/bin/env python
"""Exp 44 probe: batch-major Pallas kernel vs XLA-transpose dispatch path.

VERDICT r3 Weak #3: the public batch-major API (`forward_planes` on [b, n]
planes) paid ~23% over the raw time-major kernel at n=1024 — the cost is
the XLA HBM transposes at the boundary (api._bm_stockham). Candidate:
`stockham_fft_bm` takes [b, n] blocks straight into VMEM and does the
time-major relayout as an in-VMEM `.T` (one ~22 TB/s pass) instead.

Measures per size, paired-interleaved in one process with full-output
consumers (Exp 35 trap):
  A) current dispatch path: ctx.forward_planes+inverse_planes roundtrip
  B) bm kernel roundtrip: stockham_fft_bm fwd+inv
  C) raw time-major kernel roundtrip (the floor being chased)

Usage: python tools/probe_bm.py [--sizes 64,1024,4096] [--reps 5]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu.bench.harness import ChainTimer, enable_compile_cache
from watfft_tpu.ops.pallas_stockham import stockham_fft_nb, stockham_fft_bm
from watfft_tpu.api import FFTContext
from watfft_tpu import config

TOTAL = 1 << 21


def med(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    enable_compile_cache()
    reps = 5
    sizes = [64, 256, 1024, 4096]
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if "--sizes" in sys.argv:
        sizes = [int(s) for s in
                 sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    rng = np.random.default_rng(44)
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")

    for n in sizes:
        b = max(128, TOTAL // n)
        xre = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
        xim = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
        xre_t = jnp.asarray(np.ascontiguousarray(np.asarray(xre).T))
        xim_t = jnp.asarray(np.ascontiguousarray(np.asarray(xim).T))
        ctx = FFTContext(n, "float32")

        def astep(c, ctx=ctx):
            a, bb = c
            a, bb = ctx.forward_planes(a, bb)
            return ctx.inverse_planes(a, bb)

        def bstep(c):
            a, bb = c
            a, bb = stockham_fft_bm(a, bb, inverse=False)
            return stockham_fft_bm(a, bb, inverse=True)

        def cstep(c):
            a, bb = c
            a, bb = stockham_fft_nb(a, bb, inverse=False)
            return stockham_fft_nb(a, bb, inverse=True)

        # correctness gate for B on this backend
        ore, oim = stockham_fft_bm(xre, xim, inverse=False)
        ref = np.fft.fft(np.asarray(xre) + 1j * np.asarray(xim), axis=-1)
        err = float(np.max(np.abs(np.asarray(ore) + 1j * np.asarray(oim)
                                  - ref)) / np.max(np.abs(ref)))
        assert err < 1e-5, f"bm kernel wrong at n={n}: {err}"

        ta = ChainTimer(astep, (xre, xim)); ta.calibrate()
        tb = ChainTimer(bstep, (xre, xim)); tb.calibrate()
        tc = ChainTimer(cstep, (xre_t, xim_t)); tc.calibrate()
        As, Bs, Cs = [], [], []
        for _ in range(reps):
            As.append(ta.slope())
            Bs.append(tb.slope())
            Cs.append(tc.slope())
        a_c = med([a / c for a, c in zip(As, Cs)])
        b_c = med([x / c for x, c in zip(Bs, Cs)])
        b_a = med([x / a for x, a in zip(Bs, As)])
        print(f"n={n:<5} b={b:<6} raw={b/med(Cs):,.0f}/s  "
              f"dispatch/raw={a_c:.3f}x  bm/raw={b_c:.3f}x  "
              f"bm/dispatch={b_a:.3f}x  (err={err:.1e})")


if __name__ == "__main__":
    main()
