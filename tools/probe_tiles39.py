#!/usr/bin/env python
"""On-chip paired tile re-probe after the Exp 39 plan overrides.

Exp 38's lesson: measured decision tables go stale when adjacent machinery
changes. The w_tile/tile_b tables were swept under the radix-16 plans; the
radix-32/64 overrides change the per-stage live set and arithmetic density
at n = 32/1024/2048/4096, so re-probe:

  3D DMA kernel: w_tile 128 vs 256 at n = 1024, 2048 (table says 128)
  2D kernel:     tile_b 128 vs 256 at n = 4096 (table says 128)

Paired alternating time_chain reps, median of per-rep ratios.

Usage: python tools/probe_tiles39.py [--reps 7]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu.bench.harness import time_chain
from watfft_tpu.ops.pallas_stockham import (
    stage_plan, _stockham_call_dma3d, _stockham_call, _TwCache)

TOTAL = 1 << 21


def make_step_3d(n, w_tile):
    twf = tuple(jnp.asarray(a) for a in _TwCache.get(n, False))
    twi = tuple(jnp.asarray(a) for a in _TwCache.get(n, True))

    def step(c):
        a, b = c
        a, b = _stockham_call_dma3d(a, b, twf[0], twf[1], n, False, w_tile)
        return _stockham_call_dma3d(a, b, twi[0], twi[1], n, True, w_tile)

    return step


def make_step_2d(n, tile_b):
    twf = tuple(jnp.asarray(a) for a in _TwCache.get(n, False))
    twi = tuple(jnp.asarray(a) for a in _TwCache.get(n, True))

    def step(c):
        a, b = c
        a, b = _stockham_call(a, b, twf[0], twf[1], n, False, tile_b)
        return _stockham_call(a, b, twi[0], twi[1], n, True, tile_b)

    return step


def paired(n, three_d, v_cur, v_cand, reps):
    rng = np.random.default_rng(0)
    b = TOTAL // n
    shape = (n, 8, b // 8) if three_d else (n, b)
    xre = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    mk = make_step_3d if three_d else make_step_2d
    s_cur = mk(n, v_cur)
    s_cand = mk(n, v_cand)
    time_chain(s_cur, (xre, xim))
    time_chain(s_cand, (xre, xim))
    ratios, tc_all, td_all = [], [], []
    for _ in range(reps):
        tc = time_chain(s_cur, (xre, xim))
        td = time_chain(s_cand, (xre, xim))
        tc_all.append(tc)
        td_all.append(td)
        ratios.append(tc / td)
    ratios.sort()
    return (sorted(tc_all)[reps // 2], sorted(td_all)[reps // 2],
            ratios[len(ratios) // 2])


def main():
    reps = 7
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    print(f"platform={jax.devices()[0].platform}")
    cases = [
        (1024, True, 128, 256),
        (2048, True, 128, 256),
        (4096, False, 128, 256),
    ]
    for n, three_d, cur, cand in cases:
        plan = stage_plan(n)
        try:
            tc, td, r = paired(n, three_d, cur, cand, reps)
            print(f"  n={n:<5} {'3D w' if three_d else '2D tb'} {cur}->{cand} "
                  f"plan={plan}  cur={tc*1e6:6.1f}us cand={td*1e6:6.1f}us  "
                  f"ratio={r:.2f}x", flush=True)
        except Exception as e:
            print(f"  n={n:<5} {cur}->{cand}  FAILED: {str(e)[:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
