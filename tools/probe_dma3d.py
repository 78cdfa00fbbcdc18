#!/usr/bin/env python
"""A/B probe: in-kernel 3D relayout (current small-n mode) vs DMA-delivered
3D blocks (host view [n, 8, b/8], 3D block specs — the lane->sublane
redistribution happens inside the HBM->VMEM DMA instead of as a VPU pass).

Usage: python tools/probe_dma3d.py [n ...]
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
from watfft_tpu.ops.pallas_stockham import (
    stage_plan, make_twiddle_pack, run_stages, _TwCache, stockham_fft_nb)
from watfft_tpu.bench.harness import time_chain

TOTAL = 1 << 21


def _kernel3(n, inverse, offsets, stages,
             xre_ref, xim_ref, twre_ref, twim_ref, ore_ref, oim_ref):
    cre = xre_ref[:]          # [n, 8, w] — already 3D, no relayout pass
    cim = xim_ref[:]
    cre, cim = run_stages(cre, cim, n, inverse, offsets, stages,
                          twre_ref[:], twim_ref[:])
    ore_ref[:] = cre
    oim_ref[:] = cim


@functools.partial(jax.jit, static_argnames=("n", "inverse", "w_tile"))
def _call3(xre, xim, twre, twim, n, inverse, w_tile):
    # xre: [n, 8, W] host view of [n, b] (W = b/8)
    W = xre.shape[-1]
    stages = tuple(stage_plan(n))
    offsets = make_twiddle_pack(n, inverse)[2]
    kernel = functools.partial(_kernel3, n, inverse, offsets, stages)
    grid = (W // w_tile,)
    block = pl.BlockSpec((n, 8, w_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, 8, W), xre.dtype)
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[block, block, twspec, twspec],
        out_specs=[block, block], out_shape=[out_shape, out_shape],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
    )(xre, xim, twre, twim)


def dma3d_fft(xre, xim, inverse, w_tile):
    n, b = xre.shape
    fre, fim = (jnp.asarray(a) for a in _TwCache.get(n, inverse))
    a = xre.reshape(n, 8, b // 8)
    c = xim.reshape(n, 8, b // 8)
    ore, oim = _call3(a, c, fre, fim, n, inverse, w_tile)
    return ore.reshape(n, b), oim.reshape(n, b)


def main(sizes):
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform}")
    for n in sizes:
        b = max(128, TOTAL // n)
        xre = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
        xim = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))

        # correctness of the dma3d variant
        yre, yim = dma3d_fft(xre, xim, False, 256)
        got = np.asarray(yre)[:, 0] + 1j * np.asarray(yim)[:, 0]
        # NOTE: the [n, 8, w] view reorders the batch columns relative to
        # the 2D kernel's in-kernel reshape only in how the GRID tiles w;
        # each column is still an independent transform of the same rows,
        # so column 0 is comparable directly.
        ref = np.fft.fft(np.asarray(xre)[:, 0].astype(np.float64)
                         + 1j * np.asarray(xim)[:, 0].astype(np.float64))
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"  n={n} dma3d rel err {err:.2e}")

        def cur(c):
            a, bb = c
            a, bb = stockham_fft_nb(a, bb, inverse=False)
            return stockham_fft_nb(a, bb, inverse=True)
        t_cur = sorted(time_chain(cur, (xre, xim)) for _ in range(7))[3]

        for w_tile in (128, 256, 512):
            if (b // 8) % w_tile:
                continue

            def d3(c):
                a, bb = c
                a, bb = dma3d_fft(a, bb, False, w_tile)
                return dma3d_fft(a, bb, True, w_tile)
            t_d3 = sorted(time_chain(d3, (xre, xim)) for _ in range(7))[3]
            print(f"  n={n:<5} w_tile={w_tile:<4} dma3d={t_d3*1e6:6.1f}us  "
                  f"current={t_cur*1e6:6.1f}us  x{t_cur/t_d3:.2f}",
                  flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [64, 256])
