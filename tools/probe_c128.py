#!/usr/bin/env python
"""On-chip ladder for the weakest headline size: complex n=128 (round-5).

VERDICT r4 Weak #4: n=128 runs 2.28x vs jnp while every neighbor runs
3.9-7.3x, and no experiment ever targeted it — the tile table lumps it
into "n<=256" and the plan table gives it ((8,1),(16,8)) by default
factoring. Exp-46-style ladder, all PAIRED on chip (probe_plans3
machinery: chained fwd+inv roundtrips, median of per-rep ratios):

  A. radix plans on the native 3D layout [128, 8, 2048] (the headline row
     layout, b=16384): cur (8,16) vs (16,8), (32,4), (4,32), (64,2)
  B. w_tile for the 3D kernel at the winning plan: 128 / 256 (cur) / 512
  C. the 2D [128, 16384] kernel at tile 512 / 1024 (cur) / 2048, paired
     against the 3D winner (Exp 38's lesson: measure the boundary, don't
     extrapolate it)

Usage: python tools/probe_c128.py [--reps 7]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu.bench.harness import time_chain, enable_compile_cache
from tools.probe_plans import pack_for_plan, _call
from tools.probe_plans2 import _call2d
from tools.probe_plans3 import check, paired

TOTAL = 1 << 21
N = 128


def make_step_w(n, plan, w_tile):
    packs = {}
    for inv in (False, True):
        re, im, off = pack_for_plan(n, plan, inv)
        packs[inv] = (jnp.asarray(re), jnp.asarray(im), tuple(off))
    fre, fim, foff = packs[False]
    ire, iim, ioff = packs[True]
    plan = tuple(plan)

    def step(c):
        a, bb = c
        a, bb = _call(a, bb, fre, fim, n, False, w_tile, plan, foff)
        return _call(a, bb, ire, iim, n, True, w_tile, plan, ioff)
    return step


def make_step_2d(n, plan, tile_b):
    packs = {}
    for inv in (False, True):
        re, im, off = pack_for_plan(n, plan, inv)
        packs[inv] = (jnp.asarray(re), jnp.asarray(im), tuple(off))
    fre, fim, foff = packs[False]
    ire, iim, ioff = packs[True]
    plan = tuple(plan)

    def step(c):
        a, bb = c
        a, bb = _call2d(a, bb, fre, fim, n, False, tile_b, plan, foff)
        return _call2d(a, bb, ire, iim, n, True, tile_b, plan, ioff)
    return step


def timed(step, args, reps):
    time_chain(step, args)  # warm/compile
    ts = sorted(time_chain(step, args) for _ in range(reps))
    return ts[reps // 2]


def main():
    enable_compile_cache()
    reps = 7
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    print(f"platform={jax.devices()[0].platform} n={N}", flush=True)
    rng = np.random.default_rng(0)
    b = TOTAL // N
    x3 = (jnp.asarray(rng.uniform(-1, 1, (N, 8, b // 8)).astype(np.float32)),
          jnp.asarray(rng.uniform(-1, 1, (N, 8, b // 8)).astype(np.float32)))
    x2 = (jnp.asarray(rng.uniform(-1, 1, (N, b)).astype(np.float32)),
          jnp.asarray(rng.uniform(-1, 1, (N, b)).astype(np.float32)))

    cur = ((8, 1), (16, 8))
    cands = [((16, 1), (8, 16)), ((32, 1), (4, 32)), ((4, 1), (32, 4)),
             ((64, 1), (2, 64))]
    print("A. 3D radix plans (ratio>1: candidate wins)", flush=True)
    best_plan, best_gain = cur, 1.0
    for cand in cands:
        err = check(N, cand, True)
        tc, td, r = paired(N, cur, cand, True, reps)
        print(f"  cand={cand}  err={err:.1e}  cur={tc*1e6:6.1f}us "
              f"cand={td*1e6:6.1f}us  ratio={r:.3f}x", flush=True)
        if r > best_gain:
            best_gain, best_plan = r, cand

    print(f"B. 3D w_tile ladder at plan={best_plan}", flush=True)
    for w_tile in (128, 256, 512):
        try:
            t = timed(make_step_w(N, best_plan, w_tile), x3, reps)
            print(f"  w_tile={w_tile:<4} {t*1e6:6.1f}us", flush=True)
        except Exception as e:
            print(f"  w_tile={w_tile:<4} FAILED {str(e)[:80]}", flush=True)

    print("C. 2D tiles (vs 3D best, UNPAIRED same-process)", flush=True)
    for tile_b in (512, 1024, 2048):
        try:
            t = timed(make_step_2d(N, best_plan, tile_b), x2, reps)
            print(f"  2D tile={tile_b:<5} {t*1e6:6.1f}us", flush=True)
        except Exception as e:
            print(f"  2D tile={tile_b:<5} FAILED {str(e)[:80]}", flush=True)

    print("D. paired vs jnp roundtrip (3D best plan, w_tile=256)", flush=True)
    from watfft_tpu.bench.harness import paired_chain
    step = make_step_w(N, best_plan, 256)

    def jstep(c):
        a, bb = c
        z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
        return z.real, z.imag
    xb = (jnp.asarray(rng.uniform(-1, 1, (b, N)).astype(np.float32)),
          jnp.asarray(rng.uniform(-1, 1, (b, N)).astype(np.float32)))
    t_o, t_j, ratio, _ = paired_chain(step, x3, jstep, xb, reps=3)
    print(f"  ours={t_o*1e6:6.1f}us jnp={t_j*1e6:6.1f}us x{ratio:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
