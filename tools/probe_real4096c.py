#!/usr/bin/env python
"""Attack the real-4096 bottleneck: the m=2048 2D complex core at b=512.

probe_real4096 decomposed the bench row (in-process): core roundtrip
143us ~= fused 140 ~= bench combo 142; Hermitian passes ~free. Per point
the 2D core at [2048, 512] runs ~4.5x slower than the 3D core at
[2048, 8, 128] (b=1024). Candidates, all paired in-process:

  tile: tile_b 128 (current _pick_tile) vs 256 vs 512 (whole batch, one
        grid step — kills pipelining but may relieve VMEM re-staging)
  plan: (64,32) current | 3-stage old default | (32,64) | 16-radix chain

Usage: python tools/probe_real4096c.py [--reps 5]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu.bench.harness import ChainTimer, enable_compile_cache
from tools.probe_plans import pack_for_plan
from tools.probe_plans2 import _call2d

M, B = 2048, 512


def med(xs):
    return sorted(xs)[len(xs) // 2]


def make_step(plan, tile_b):
    packs = {}
    for inv in (False, True):
        re, im, off = pack_for_plan(M, plan, inv)
        packs[inv] = (jnp.asarray(re), jnp.asarray(im), tuple(off))
    fre, fim, foff = packs[False]
    ire, iim, ioff = packs[True]
    plan = tuple(plan)

    def step(c):
        a, bb = c
        a, bb = _call2d(a, bb, fre, fim, M, False, tile_b, plan, foff)
        return _call2d(a, bb, ire, iim, M, True, tile_b, plan, ioff)

    return step


def main():
    enable_compile_cache()
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    print(f"platform={jax.devices()[0].platform} m={M} b={B}", flush=True)
    rng = np.random.default_rng(0)
    xre = jnp.asarray(rng.uniform(-1, 1, (M, B)).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, (M, B)).astype(np.float32))

    cur = ((64, 1), (32, 64))
    cands = [
        ("cur plan, tile 128", cur, 128),
        ("cur plan, tile 256", cur, 256),
        ("cur plan, tile 512", cur, 512),
        ("old 3-stage, tile 128", ((8, 1), (16, 8), (16, 128)), 128),
        ("32*64 order, tile 128", ((32, 1), (64, 32)), 128),
        ("16-chain, tile 128", ((16, 1), (16, 16), (8, 256)), 128),
        ("old 3-stage, tile 512", ((8, 1), (16, 8), (16, 128)), 512),
    ]

    # correctness gate on column 0 vs numpy (forward only)
    x0 = (np.asarray(xre)[:, 0].astype(np.float64)
          + 1j * np.asarray(xim)[:, 0].astype(np.float64))
    ref = np.fft.fft(x0)
    for label, plan, tile_b in cands:
        re, im, off = pack_for_plan(M, plan, False)
        yre, yim = _call2d(xre, xim, jnp.asarray(re), jnp.asarray(im), M,
                           False, tile_b, tuple(plan), tuple(off))
        got = (np.asarray(yre)[:, 0].astype(np.float64)
               + 1j * np.asarray(yim)[:, 0].astype(np.float64))
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert err < 1e-5, (label, err)

    timers = {}
    for label, plan, tile_b in cands:
        timers[label] = ChainTimer(make_step(plan, tile_b), (xre, xim))
        timers[label].calibrate()
    ts = {k: [] for k in timers}
    for _ in range(reps):
        for k, t_ in timers.items():
            ts[k].append(t_.slope())
    base = med(ts["cur plan, tile 128"])
    for label, _, _ in cands:
        t = med(ts[label])
        print(f"  {label:<24} {t*1e6:7.1f} us/roundtrip  "
              f"ratio(cur/cand)={base/t:.3f}x", flush=True)


if __name__ == "__main__":
    main()
