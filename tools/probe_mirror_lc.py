#!/usr/bin/env python
"""Exp 41 probe: lane-concat MXU mirror in the fused real kernels.

The fused kernels' Hermitian mirror currently runs as 2*nb separate
[G, G] @ [G, tile_b] dots (re + im, one per row block). At the sizes where
the fused kernel loses to the hybrid (fwd 128-512/2048/8192, inv 4096+,
Exp 32/35 tables) the loss is mirror-matmul-LATENCY-bound. Candidate:
ONE [G, G] @ [G, 2*nb*tile_b] dot with re/im and all blocks concatenated
on the lane axis (_mirror_rows_many) — same MACs, 1/(2*nb) the dot count.

Measures, per size and direction, standalone chains with unprunable
consumers (Exp 35 trap): hybrid vs fused/per-block vs fused/lane-concat,
interleaved within one process; prints median-of-ratios.

Usage: python tools/probe_mirror_lc.py [--reps 5] [--sizes 128,256,...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu import config
from watfft_tpu.bench.harness import ChainTimer, enable_compile_cache
from watfft_tpu.ops import pallas_rfft as pr

TOTAL = 1 << 21


def med(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    enable_compile_cache()
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sizes = [128, 256, 512, 1024, 2048, 4096, 8192]
    if "--sizes" in sys.argv:
        sizes = [int(s) for s in
                 sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    rng = np.random.default_rng(41)

    def fused(x, lc):
        config.RFFT_MIRROR_LC_SIZES = (
            frozenset(sizes) if lc else frozenset())
        return pr._rfft_fused_impl(x)

    def ifused(re, im, lc):
        config.RFFT_MIRROR_LC_SIZES = (
            frozenset(sizes) if lc else frozenset())
        return pr._irfft_fused_impl(re, im)

    # correctness gate: lc vs per-block must agree bit-for-bit-ish
    n0 = sizes[0]
    x0 = rng.uniform(-1, 1, (n0, 256)).astype(np.float32)
    a = fused(jnp.asarray(x0), False)
    b_ = fused(jnp.asarray(x0), True)
    err = max(float(jnp.max(jnp.abs(a[0] - b_[0]))),
              float(jnp.max(jnp.abs(a[1] - b_[1]))))
    y0 = ifused(a[0], a[1], False)
    y1 = ifused(b_[0], b_[1], True)
    erri = float(jnp.max(jnp.abs(y0 - y1)))
    ref = np.fft.rfft(x0.astype(np.float64), axis=0)
    scale = np.abs(ref).max()
    errf = max(np.abs(np.asarray(b_[0]) - ref.real).max(),
               np.abs(np.asarray(b_[1]) - ref.imag).max()) / scale
    print(f"correctness n={n0}: lc-vs-blk fwd {err:.2e} inv {erri:.2e} "
          f"lc-vs-numpy rel {errf:.2e}", flush=True)
    assert errf < 1e-5

    for n in sizes:
        b = max(128, TOTAL // n)
        m = n // 2
        x = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
        sre = jnp.asarray(rng.uniform(-1, 1, (m + 1, b)).astype(np.float32))
        sim = jnp.asarray(rng.uniform(-1, 1, (m + 1, b)).astype(np.float32))

        def fwd_chain(rf):
            def step(c):
                yre, yim = rf(c)
                upd = jnp.concatenate([yre, yim[1:]], axis=0)[:n]
                return c + upd * jnp.float32(1e-30)
            return step

        def inv_chain(rif):
            def step(c):
                re, im = c
                y = rif(re, im)
                upd = (y[:m + 1] + y[m - 1:]) * jnp.float32(1e-30)
                return re + upd, im
            return step

        cand_f = {
            "hyb": fwd_chain(pr._rfft_impl),
            "blk": fwd_chain(lambda x_: fused(x_, False)),
            "lc":  fwd_chain(lambda x_: fused(x_, True)),
        }
        cand_i = {
            "hyb": inv_chain(pr._irfft_impl),
            "blk": inv_chain(lambda r, i: ifused(r, i, False)),
            "lc":  inv_chain(lambda r, i: ifused(r, i, True)),
        }
        for tag, cands, args in (("fwd", cand_f, x),
                                 ("inv", cand_i, (sre, sim))):
            timers = {}
            for k, step in cands.items():
                timers[k] = ChainTimer(step, args)
                timers[k].calibrate()
            ts = {k: [] for k in cands}
            for _ in range(reps):
                for k, t_ in timers.items():
                    ts[k].append(t_.slope())
            t = {k: med(v) for k, v in ts.items()}
            r_lc_blk = med([b_ / a_ for a_, b_ in zip(ts["lc"], ts["blk"])])
            r_lc_hyb = med([b_ / a_ for a_, b_ in zip(ts["lc"], ts["hyb"])])
            print(f"n={n:<6}{tag}  hyb={t['hyb']*1e6:8.1f}us "
                  f"blk={t['blk']*1e6:8.1f}us lc={t['lc']*1e6:8.1f}us  "
                  f"lc/blk x{r_lc_blk:.2f}  lc/hyb x{r_lc_hyb:.2f}",
                  flush=True)


if __name__ == "__main__":
    main()
