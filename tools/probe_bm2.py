#!/usr/bin/env python
"""Exp 44 follow-up: dispatch-path variants at the sizes where the public
batch-major API still trails the raw kernel (n=1024: 1.2x the 2D raw time,
probe_bm.py). Variants, paired in one process:

  A) dispatch as-is (XLA transpose + 3D fold, api._bm_stockham)
  B) dispatch with the 3D fold disabled (DMA3D_MAX_N=0: transpose + 2D kernel)
  C) raw 3D-native roundtrip (the headline bench's denominator at n<=2048)
  D) raw 2D roundtrip

Usage: python tools/probe_bm2.py [--sizes 1024] [--reps 5]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu.bench.harness import ChainTimer, enable_compile_cache
from watfft_tpu.ops.pallas_stockham import stockham_fft_nb
from watfft_tpu.api import FFTContext
from watfft_tpu import config

TOTAL = 1 << 21


def med(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    enable_compile_cache()
    reps = 5
    sizes = [256, 1024, 2048]
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if "--sizes" in sys.argv:
        sizes = [int(s) for s in
                 sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    rng = np.random.default_rng(45)
    print(f"backend={jax.default_backend()}")

    for n in sizes:
        b = max(128, TOTAL // n)
        xre = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
        xim = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
        t2 = np.ascontiguousarray(np.asarray(xre).T)
        i2 = np.ascontiguousarray(np.asarray(xim).T)
        xre_t, xim_t = jnp.asarray(t2), jnp.asarray(i2)
        w = b // 8
        xre3 = jnp.asarray(t2.reshape(n, 8, w))
        xim3 = jnp.asarray(i2.reshape(n, 8, w))
        ctx = FFTContext(n, "float32")

        def dstep(c, ctx=ctx):
            a, bb = c
            a, bb = ctx.forward_planes(a, bb)
            return ctx.inverse_planes(a, bb)

        def rstep(c):
            a, bb = c
            a, bb = stockham_fft_nb(a, bb, inverse=False)
            return stockham_fft_nb(a, bb, inverse=True)

        saved = config.DMA3D_MAX_N
        timers = {}
        config.DMA3D_MAX_N = saved
        timers["A_disp3d"] = ChainTimer(dstep, (xre, xim))
        timers["A_disp3d"].calibrate()
        config.DMA3D_MAX_N = 0
        # fresh context jit cache not needed: forward_planes re-traces per
        # ChainTimer chain; config is read at trace time
        timers["B_disp2d"] = ChainTimer(dstep, (xre, xim))
        timers["B_disp2d"].calibrate()
        config.DMA3D_MAX_N = saved
        timers["C_raw3d"] = ChainTimer(rstep, (xre3, xim3))
        timers["C_raw3d"].calibrate()
        timers["D_raw2d"] = ChainTimer(rstep, (xre_t, xim_t))
        timers["D_raw2d"].calibrate()

        samples = {k: [] for k in timers}
        for _ in range(reps):
            for k, t in timers.items():
                samples[k].append(t.slope())
        c = samples["C_raw3d"]
        out = {k: med([a / cc for a, cc in zip(v, c)])
               for k, v in samples.items()}
        print(f"n={n:<5} b={b:<6} raw3d={b/med(c):,.0f}/s  " +
              "  ".join(f"{k}/raw3d={v:.3f}x" for k, v in out.items()
                        if k != "C_raw3d"))


if __name__ == "__main__":
    main()
