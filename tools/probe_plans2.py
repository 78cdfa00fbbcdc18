#!/usr/bin/env python
"""On-chip probe #2: radix-32/64 stage plans at n = 512..16384.

probe_plans.py (round-3 session 2) measured a single radix-32 stage at
n=32 winning 1.48x (10.8 vs 16.0us) over the (16,1),(2,16) plan — one
interleave pass instead of two. The same stage-count reduction exists at
every n whose log2 is not a multiple of 4:

  512   = 16*32          2 stages (current: 16,16,2 -> 3)
  1024  = 32*32          2 stages (current: 16,4,16 -> 3)
  2048  = 32*64          2 stages (current: 8,16,16 -> 3)
  4096  = 64*64          2 stages (current: 16,16,16 -> 3)
  8192  = 32*16*16       3 stages (current: 16,2,16,16 -> 4)
  16384 = 32*32*16       3 stages (current: 16,4,16,16 -> 4)

n <= 2048 probes the DMA-3D kernel (the dispatched layout at headline
batches); 4096+ probes the 2D kernel (W = batch/8 < 128 blocks 3D there).

Usage: python tools/probe_plans2.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from watfft_tpu import config
from watfft_tpu.ops.pallas_stockham import _kernel_dma3d, _kernel, _pick_tile
from watfft_tpu.bench.harness import time_chain
from tools.probe_plans import pack_for_plan, run_plan

TOTAL = 1 << 21


@functools.partial(jax.jit, static_argnames=("n", "inverse", "tile_b",
                                             "stages", "offsets"))
def _call2d(xre, xim, twre, twim, n, inverse, tile_b, stages, offsets):
    b = xre.shape[-1]
    kernel = functools.partial(_kernel, n, inverse, list(offsets),
                               list(stages), False, False)
    grid = (b // tile_b,)
    block = pl.BlockSpec((n, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, b), xre.dtype)
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[block, block, twspec, twspec],
        out_specs=[block, block], out_shape=[out_shape, out_shape],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
    )(xre, xim, twre, twim)


def run_plan_2d(n, plan, reps=5):
    b = TOTAL // n
    tile_b = _pick_tile(n, b)
    rng = np.random.default_rng(0)
    xre = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    packs = {}
    for inv in (False, True):
        re, im, off = pack_for_plan(n, plan, inv)
        packs[inv] = (jnp.asarray(re), jnp.asarray(im), tuple(off))
    fre, fim, foff = packs[False]
    yre, yim = _call2d(xre, xim, fre, fim, n, False, tile_b, tuple(plan), foff)
    got = (np.asarray(yre)[:, 0].astype(np.float64)
           + 1j * np.asarray(yim)[:, 0].astype(np.float64))
    x0 = (np.asarray(xre)[:, 0].astype(np.float64)
          + 1j * np.asarray(xim)[:, 0].astype(np.float64))
    ref = np.fft.fft(x0)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    ire, iim, ioff = packs[True]

    def step(c):
        a, bb = c
        a, bb = _call2d(a, bb, fre, fim, n, False, tile_b, tuple(plan), foff)
        return _call2d(a, bb, ire, iim, n, True, tile_b, tuple(plan), ioff)

    ts = sorted(time_chain(step, (xre, xim)) for _ in range(reps))
    return err, ts[len(ts) // 2]


def main():
    print(f"platform={jax.devices()[0].platform}")
    cases3d = {
        256: [((32, 1), (8, 32))],             # (64,1),(4,64) won 23.2 vs 30.0
        512: [((16, 1), (2, 16), (16, 32)),    # current
              ((16, 1), (32, 16)),
              ((32, 1), (16, 32)),
              ((64, 1), (8, 64))],
        1024: [((16, 1), (4, 16), (16, 64)),   # current
               ((32, 1), (32, 32)),
               ((64, 1), (16, 64))],
        2048: [((8, 1), (16, 8), (16, 128)),   # current
               ((32, 1), (64, 32)),
               ((64, 1), (32, 64))],
    }
    for n, plans in cases3d.items():
        for plan in plans:
            try:
                err, med = run_plan(n, plan, w_tile=128, reps=5)
                print(f"  3D n={n:<5} plan={plan}  med={med*1e6:6.1f}us  "
                      f"err={err:.1e}", flush=True)
            except Exception as e:
                print(f"  3D n={n:<5} plan={plan}  FAILED: {str(e)[:90]}",
                      flush=True)
    cases2d = {
        4096: [((16, 1), (16, 16), (16, 256)),  # current
               ((64, 1), (64, 64))],
        8192: [((16, 1), (2, 16), (16, 32), (16, 512)),  # current
               ((32, 1), (16, 32), (16, 512)),
               ((32, 1), (32, 32), (8, 1024))],
    }
    for n, plans in cases2d.items():
        for plan in plans:
            try:
                err, med = run_plan_2d(n, plan, reps=5)
                print(f"  2D n={n:<5} plan={plan}  med={med*1e6:6.1f}us  "
                      f"err={err:.1e}", flush=True)
            except Exception as e:
                print(f"  2D n={n:<5} plan={plan}  FAILED: {str(e)[:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
