#!/usr/bin/env python
"""Reconcile the real-4096 bench row (68us roundtrip) with probe_real4096
(142us for the same composition) — both stable, 2.1x apart. Replicates
the bench's exact paired_chain call and the probe's plain ChainTimer in
ONE process, printing calibrated chain lengths.

Usage: python tools/probe_real4096b.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu.bench.harness import ChainTimer, paired_chain, enable_compile_cache
from watfft_tpu.ops.pallas_rfft import rfft_nb_fused, irfft_nb

n, b = 4096, 512


def main():
    enable_compile_cache()
    print(f"platform={jax.devices()[0].platform} n={n} b={b}", flush=True)
    rng = np.random.default_rng(0)
    xr_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))

    def rstep(c):
        re, im = rfft_nb_fused(c)
        return irfft_nb(re, im)

    xr = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

    def jrstep(c):
        return jnp.fft.irfft(jnp.fft.rfft(c), n=n)

    # (a) bench-style paired call (floor identical to bench.py's)
    floor = (4 * xr_t.size * 4) / 1.6e12 / 2
    t_r, t_jr, ratio, st = paired_chain(rstep, xr_t, jrstep, xr, reps=3,
                                        floor_ours=floor)
    print(f"  paired: ours={t_r*1e6:.1f}us jnp={t_jr*1e6:.1f}us "
          f"ratio={ratio:.2f} ours_times={[f'{t*1e6:.1f}' for t in st['ours_times']]}",
          flush=True)

    # (b) plain ChainTimer on the same step with diagnostics
    t = ChainTimer(rstep, xr_t)
    t.calibrate()
    print(f"  plain ChainTimer: r1={t.r1} r2={t.r2}", flush=True)
    slopes = [t.slope() for _ in range(5)]
    print(f"  slopes us: {[f'{s*1e6:.1f}' for s in slopes]}", flush=True)


if __name__ == "__main__":
    main()
