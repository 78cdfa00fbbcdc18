#!/usr/bin/env python
"""On-chip sweep of the 8192-32768 "crossover valley" (round-3 item #1).

BENCH_r02 measured 2.45x / 1.24x / 1.18x at n=8192/16384/32768 vs the >=2x
bar the rest of the repo clears. Candidates per size:

  8192:  single Stockham kernel (current dispatch) vs the batched four-step
         with the NEW (128, 64) split (n2=64 inner factor, relaxed this round)
  16384: single Stockham kernel (current, VMEM-choked at ~17 [n,128] planes)
         vs four-step (128,128) / (256,64) with tbk sweep
  32768: four-step (256,128) [current default] vs (128,256) / (512,64),
         tbk in {4, 8, 16, 32}

Usage: python tools/probe_valley.py [--reps 5]
Paired with a jnp.fft measurement per size (median of paired ratios).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu.bench.harness import time_chain
from watfft_tpu.ops.pallas_stockham import stockham_fft_nb
from watfft_tpu.ops.large import fft_large_nb

TOTAL = 1 << 21


def measure(step, args, reps):
    ts = sorted(time_chain(step, args) for _ in range(reps))
    return ts[len(ts) // 2]


def main():
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    rng = np.random.default_rng(7)

    # round-3 rev 3: sweep the single-kernel CUBE four-step (4 HBM passes)
    # against the best two-kernel pipeline configs (8 passes) and the
    # direct Stockham kernel. Entries: (kind, split, tbk, tbj);
    # kind "cube" ignores tbk/tbj.
    plans = {
        8192: [("stockham", None, None, None),
               ("cube", (128, 64), None, None),
               ("large-nb", (128, 64), 8, 8)],
        16384: [("stockham", None, None, None),
                ("cube", (128, 128), None, None),
                ("large-nb", (128, 128), 8, 16)],
        32768: [("cube", (256, 128), None, None),
                ("cube", (128, 256), None, None),
                ("large-nb", (128, 256), 8, 16),
                ("large-nb", (256, 128), 8, 16)],
        65536: [("cube", (256, 256), None, None),
                ("large-nb", (256, 256), 8, 16)],
    }

    for n, cands in plans.items():
        b = max(128, TOTAL // n)
        xre_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
        xim_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
        xre = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
        xim = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

        def jstep(c):
            a, bb = c
            z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
            return z.real, z.imag

        t_j = measure(jstep, (xre, xim), reps)
        print(f"n={n} b={b}  jnp={t_j*1e6:,.1f}us  "
              f"(floor {4*n*b*4/1.638e12*1e6:.1f}us)", flush=True)

        # correctness oracle for this size (batch col 0)
        ref = np.fft.fft(np.asarray(xre_t[:, 0]) + 1j * np.asarray(xim_t[:, 0]))

        for kind, split, tbk, tbj in cands:
            label = (f"{kind}" if split is None
                     else f"{kind} {split[0]}x{split[1]} tbk={tbk} tbj={tbj}")
            try:
                mode = "cube" if kind == "cube" else "pipe2"
                if kind == "stockham":
                    def step(c):
                        a, bb = c
                        a, bb = stockham_fft_nb(a, bb, inverse=False)
                        return stockham_fft_nb(a, bb, inverse=True)
                else:
                    def step(c, split=split, tbk=tbk, tbj=tbj, mode=mode):
                        a, bb = c
                        a, bb = fft_large_nb(a, bb, inverse=False,
                                             split=split, tbk=tbk, tbj=tbj,
                                             mode=mode)
                        return fft_large_nb(a, bb, inverse=True,
                                            split=split, tbk=tbk, tbj=tbj,
                                            mode=mode)
                # quick correctness gate (forward only, col 0)
                if kind != "stockham":
                    fre, fim = fft_large_nb(xre_t, xim_t, inverse=False,
                                            split=split, tbk=tbk, tbj=tbj,
                                            mode=mode)
                    got = np.asarray(fre[:, 0]) + 1j * np.asarray(fim[:, 0])
                    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
                    if err > 1e-4:
                        print(f"  {label:<28} WRONG (rel err {err:.1e})",
                              flush=True)
                        continue
                t = measure(step, (xre_t, xim_t), reps)
                print(f"  {label:<28} {t*1e6:>9,.1f}us  x{t_j/t:.2f}",
                      flush=True)
            except Exception as e:
                print(f"  {label:<28} FAILED: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
