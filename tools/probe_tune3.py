#!/usr/bin/env python
"""Round-3 tuning probe (after the valley probe picked cube/pipe2 winners):

1. pipe2 tbj/tbk sweep at n=32768/65536, split check at 2^17, 2^20 sanity
2. planner-dispatched defaults at 8192/16384/32768 (what bench.py will see)
3. blocked-MXU-mirror fused real path vs the hybrid on chip (VERDICT r2 #5)

Usage: python tools/probe_tune3.py [--reps 3]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from watfft_tpu.bench.harness import time_chain
from watfft_tpu.ops.large import fft_large_nb
from watfft_tpu.ops.pallas_rfft import rfft_nb, irfft_nb, rfft_nb_fused, irfft_nb_fused

TOTAL = 1 << 21


def measure(step, args, reps):
    ts = sorted(time_chain(step, args) for _ in range(reps))
    return ts[len(ts) // 2]


def main():
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    rng = np.random.default_rng(7)

    # ---- 1. pipe2 tile sweep -------------------------------------------
    plans = {
        32768: [((128, 256), tbk, tbj) for tbj in (8, 16, 32)
                for tbk in (8, 16)],
        65536: [((256, 256), 8, 8), ((256, 256), 8, 16), ((256, 256), 16, 16)],
        131072: [((256, 512), 8, 16), ((512, 256), 8, 16)],
        1 << 20: [((1024, 1024), 8, 8), ((1024, 1024), 8, 16)],
    }
    for n, cands in plans.items():
        b = max(128, TOTAL // n)
        xre_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
        xim_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
        ref = np.fft.fft(np.asarray(xre_t[:, 0]) + 1j * np.asarray(xim_t[:, 0]))
        print(f"n={n} b={b}  (roundtrip floor "
              f"{4*n*b*4/1.638e12*1e6:.1f}us)", flush=True)
        for split, tbk, tbj in cands:
            label = f"pipe2 {split[0]}x{split[1]} tbk={tbk} tbj={tbj}"
            try:
                fre, fim = fft_large_nb(xre_t, xim_t, split=split, tbk=tbk,
                                        tbj=tbj, mode="pipe2")
                got = np.asarray(fre[:, 0]) + 1j * np.asarray(fim[:, 0])
                err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
                if err > 1e-4:
                    print(f"  {label:<34} WRONG (rel {err:.1e})", flush=True)
                    continue

                def step(c, split=split, tbk=tbk, tbj=tbj):
                    a, bb = c
                    a, bb = fft_large_nb(a, bb, split=split, tbk=tbk,
                                         tbj=tbj, mode="pipe2")
                    return fft_large_nb(a, bb, inverse=True, split=split,
                                        tbk=tbk, tbj=tbj, mode="pipe2")
                t = measure(step, (xre_t, xim_t), reps)
                print(f"  {label:<34} {t*1e6:>9,.1f}us", flush=True)
            except Exception as e:
                print(f"  {label:<34} FAILED: {str(e)[:90]}", flush=True)

    # ---- 2. planner-dispatched defaults --------------------------------
    from watfft_tpu import planner
    from watfft_tpu.ops.pallas_stockham import stockham_fft_nb
    for n in (8192, 16384, 32768):
        b = max(128, TOTAL // n)
        xre_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
        xim_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
        xre = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
        xim = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
        kname = planner.c2c_kernel(n, "float32")

        if kname == "stockham":
            def step(c):
                a, bb = c
                a, bb = stockham_fft_nb(a, bb)
                return stockham_fft_nb(a, bb, inverse=True)
        else:
            def step(c):
                a, bb = c
                a, bb = fft_large_nb(a, bb)
                return fft_large_nb(a, bb, inverse=True)

        def jstep(c):
            a, bb = c
            z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
            return z.real, z.imag
        t = measure(step, (xre_t, xim_t), reps)
        t_j = measure(jstep, (xre, xim), reps)
        print(f"dispatch n={n} -> {kname}: {t*1e6:,.1f}us "
              f"jnp={t_j*1e6:,.1f}us x{t_j/t:.2f}", flush=True)

    # ---- 3. fused real vs hybrid ---------------------------------------
    for n in (1024, 4096):
        b = max(128, TOTAL // n)
        xr_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
        # correctness on chip first
        re, im = rfft_nb_fused(xr_t)
        refs = np.fft.rfft(np.asarray(xr_t[:, 0]))
        got = np.asarray(re[:, 0]) + 1j * np.asarray(im[:, 0])
        err = np.max(np.abs(got - refs)) / np.max(np.abs(refs))

        def fstep(c):
            a, bb = rfft_nb_fused(c)
            return irfft_nb_fused(a, bb)

        def hstep(c):
            a, bb = rfft_nb(c)
            return irfft_nb(a, bb)
        t_f = measure(fstep, xr_t, reps)
        t_h = measure(hstep, xr_t, reps)
        print(f"real n={n}: fused={t_f*1e6:,.1f}us hybrid={t_h*1e6:,.1f}us "
              f"(fused/hybrid {t_f/t_h:.2f}; rel err {err:.1e})", flush=True)


if __name__ == "__main__":
    main()
