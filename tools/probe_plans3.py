#!/usr/bin/env python
"""On-chip PAIRED confirmation of the radix-32/64 stage-plan candidates.

probe_plans.py / probe_plans2.py (round-3 session 3) measured, same-session
but unpaired:

  n=32    (32,1)                 9.1 vs 14.8us          1.63x
  n=256   (64,1),(4,64)         39.1 vs 50.0us          1.28x
          (32,1),(8,32)         29.7us (separate run)   ?
  n=1024  (64,1),(16,64)        49.8 vs 50.3us          tie
  n=2048  (64,1),(32,64)        14.8 vs 35.0us          2.4x (!)
  n=4096  (64,1),(64,64) [2D]   76.3 vs 107.8us         1.41x
  n=8192  (32,1),(16,32),(16,512) 159.3 vs 178.6us      1.12x

This probe re-runs each case PAIRED (alternating current/candidate
time_chain calls, median of per-rep ratios) to strip drift before the
plan table is changed.

Usage: python tools/probe_plans3.py [--reps 7]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu.bench.harness import time_chain
from watfft_tpu.ops.pallas_stockham import _pick_tile
from tools.probe_plans import pack_for_plan, _call
from tools.probe_plans2 import _call2d

TOTAL = 1 << 21


def make_step(n, plan, three_d):
    b = TOTAL // n
    packs = {}
    for inv in (False, True):
        re, im, off = pack_for_plan(n, plan, inv)
        packs[inv] = (jnp.asarray(re), jnp.asarray(im), tuple(off))
    fre, fim, foff = packs[False]
    ire, iim, ioff = packs[True]
    plan = tuple(plan)
    if three_d:
        w_tile = 128 if n > 128 else 256

        def step(c):
            a, bb = c
            a, bb = _call(a, bb, fre, fim, n, False, w_tile, plan, foff)
            return _call(a, bb, ire, iim, n, True, w_tile, plan, ioff)
    else:
        tile_b = _pick_tile(n, b)

        def step(c):
            a, bb = c
            a, bb = _call2d(a, bb, fre, fim, n, False, tile_b, plan, foff)
            return _call2d(a, bb, ire, iim, n, True, tile_b, plan, ioff)

    return step


def check(n, plan, three_d):
    """Correctness of the forward plan on column 0 vs numpy."""
    rng = np.random.default_rng(0)
    b = TOTAL // n
    if three_d:
        shape = (n, 8, b // 8)
    else:
        shape = (n, b)
    xre = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    re, im, off = pack_for_plan(n, plan, False)
    fre, fim = jnp.asarray(re), jnp.asarray(im)
    if three_d:
        w_tile = 128 if n > 128 else 256
        yre, yim = _call(xre, xim, fre, fim, n, False, w_tile, tuple(plan),
                         tuple(off))
        got = (np.asarray(yre)[:, 0, 0].astype(np.float64)
               + 1j * np.asarray(yim)[:, 0, 0].astype(np.float64))
        x0 = (np.asarray(xre)[:, 0, 0].astype(np.float64)
              + 1j * np.asarray(xim)[:, 0, 0].astype(np.float64))
    else:
        tile_b = _pick_tile(n, b)
        yre, yim = _call2d(xre, xim, fre, fim, n, False, tile_b, tuple(plan),
                           tuple(off))
        got = (np.asarray(yre)[:, 0].astype(np.float64)
               + 1j * np.asarray(yim)[:, 0].astype(np.float64))
        x0 = (np.asarray(xre)[:, 0].astype(np.float64)
              + 1j * np.asarray(xim)[:, 0].astype(np.float64))
    ref = np.fft.fft(x0)
    return np.max(np.abs(got - ref)) / np.max(np.abs(ref))


def paired(n, cur, cand, three_d, reps):
    rng = np.random.default_rng(0)
    b = TOTAL // n
    shape = (n, 8, b // 8) if three_d else (n, b)
    xre = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    s_cur = make_step(n, cur, three_d)
    s_cand = make_step(n, cand, three_d)
    # warm both
    time_chain(s_cur, (xre, xim))
    time_chain(s_cand, (xre, xim))
    ratios, ts_cur, ts_cand = [], [], []
    for _ in range(reps):
        tc = time_chain(s_cur, (xre, xim))
        td = time_chain(s_cand, (xre, xim))
        ts_cur.append(tc)
        ts_cand.append(td)
        ratios.append(tc / td)
    ratios.sort()
    med_ratio = ratios[len(ratios) // 2]
    return (sorted(ts_cur)[reps // 2], sorted(ts_cand)[reps // 2], med_ratio)


def main():
    reps = 7
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    print(f"platform={jax.devices()[0].platform}")
    cases = [
        # (n, three_d, current plan, candidate plan)
        (32, True, ((16, 1), (2, 16)), ((32, 1),)),
        (256, True, ((16, 1), (16, 16)), ((32, 1), (8, 32))),
        (256, True, ((16, 1), (16, 16)), ((64, 1), (4, 64))),
        (1024, True, ((16, 1), (4, 16), (16, 64)), ((64, 1), (16, 64))),
        (2048, True, ((8, 1), (16, 8), (16, 128)), ((64, 1), (32, 64))),
        (4096, False, ((16, 1), (16, 16), (16, 256)), ((64, 1), (64, 64))),
        (8192, False, ((16, 1), (2, 16), (16, 32), (16, 512)),
         ((32, 1), (16, 32), (16, 512))),
    ]
    for n, three_d, cur, cand in cases:
        err = check(n, cand, three_d)
        tc, td, r = paired(n, cur, cand, three_d, reps)
        print(f"  n={n:<5} {'3D' if three_d else '2D'} cand={cand}  "
              f"cur={tc*1e6:6.1f}us cand={td*1e6:6.1f}us  "
              f"ratio={r:.2f}x  err={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
