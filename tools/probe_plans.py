#!/usr/bin/env python
"""On-chip probe: custom stage plans for the DMA-3D kernel at tiny n.

Exp 17 measured single full-radix plans as no better than mixed-radix —
but that was BEFORE the DMA-3D mode removed the relayout pass (Exp 28).
Re-test: at n=64 the current plan is [(16,1),(4,16)] (two interleaves);
a single radix-64 stage does one.

Usage: python tools/probe_plans.py
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
from watfft_tpu.ops.pallas_stockham import _kernel_dma3d
from watfft_tpu.bench.harness import time_chain

TOTAL = 1 << 21


def pack_for_plan(n, stages, inverse):
    """make_twiddle_pack with an explicit stage plan."""
    sign = +1.0 if inverse else -1.0
    res, ims, offsets = [], [], []
    off = 0
    for idx, (r, l) in enumerate(stages):
        if l == 1:
            offsets.append(-1)
            continue
        rows = n // r
        k = np.arange(rows, dtype=np.int64) % l
        scale = (1.0 / n) if (inverse and idx == len(stages) - 1) else 1.0
        for p in range(1, r):
            ang = sign * 2.0 * np.pi * ((p * k) % (r * l)) / (r * l)
            res.append((scale * np.cos(ang)).astype(np.float32))
            ims.append((scale * np.sin(ang)).astype(np.float32))
        offsets.append(off)
        off += (r - 1) * rows
    if not res:
        res, ims = [np.ones(1, np.float32)], [np.zeros(1, np.float32)]
    return (np.concatenate(res).reshape(-1, 1),
            np.concatenate(ims).reshape(-1, 1), offsets)


@functools.partial(jax.jit, static_argnames=("n", "inverse", "w_tile",
                                             "stages", "offsets"))
def _call(xre, xim, twre, twim, n, inverse, w_tile, stages, offsets):
    W = xre.shape[-1]
    kernel = functools.partial(_kernel_dma3d, n, inverse, list(offsets),
                               list(stages))
    grid = (W // w_tile,)
    block = pl.BlockSpec((n, 8, w_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, 8, W), xre.dtype)
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[block, block, twspec, twspec],
        out_specs=[block, block], out_shape=[out_shape, out_shape],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
    )(xre, xim, twre, twim)


def run_plan(n, plan, w_tile=256, reps=7):
    b = TOTAL // n
    rng = np.random.default_rng(0)
    xre = jnp.asarray(rng.uniform(-1, 1, (n, 8, b // 8)).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, (n, 8, b // 8)).astype(np.float32))
    packs = {}
    for inv in (False, True):
        re, im, off = pack_for_plan(n, plan, inv)
        packs[inv] = (jnp.asarray(re), jnp.asarray(im), tuple(off))

    # correctness
    fre, fim, foff = packs[False]
    yre, yim = _call(xre, xim, fre, fim, n, False, w_tile, tuple(plan), foff)
    got = (np.asarray(yre)[:, 0, 0].astype(np.float64)
           + 1j * np.asarray(yim)[:, 0, 0].astype(np.float64))
    x0 = (np.asarray(xre)[:, 0, 0].astype(np.float64)
          + 1j * np.asarray(xim)[:, 0, 0].astype(np.float64))
    ref = np.fft.fft(x0)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))

    ire, iim, ioff = packs[True]

    def step(c):
        a, bb = c
        a, bb = _call(a, bb, fre, fim, n, False, w_tile, tuple(plan), foff)
        return _call(a, bb, ire, iim, n, True, w_tile, tuple(plan), ioff)

    ts = sorted(time_chain(step, (xre, xim)) for _ in range(reps))
    return err, ts[len(ts) // 2]


def main():
    print(f"platform={jax.devices()[0].platform}")
    cases = {
        64: [((16, 1), (4, 16)),   # current
             ((64, 1),)],          # single full radix
        32: [((16, 1), (2, 16)),   # current
             ((32, 1),)],
        128: [((8, 1), (16, 8)),   # current
              ((128, 1),),         # single full radix
              ((64, 1), (2, 64))],
        256: [((16, 1), (16, 16)),  # current
              ((64, 1), (4, 64))],
    }
    for n, plans in cases.items():
        for plan in plans:
            try:
                err, med = run_plan(n, plan)
                print(f"  n={n:<4} plan={plan}  med={med*1e6:6.1f}us  "
                      f"err={err:.1e}", flush=True)
            except Exception as e:
                print(f"  n={n:<4} plan={plan}  FAILED: {str(e)[:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
