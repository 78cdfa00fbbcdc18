#!/usr/bin/env python
"""On-chip A/B probe: Stockham kernel tile/layout matrix at mid sizes.

Round-2 follow-up to Exps 10/21: the headline bench measured n=256 above
its Exp-21 time (136us roundtrip vs 57-77us) and n=64 below 2x. This probe
re-measures the (tile_b, use3d) matrix with many reps so the tunnel's
per-hour jitter band (Exp 21) can't pick the winner.

Usage: python tools/probe_tiles.py [n ...]
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
    _kernel, stage_plan, make_twiddle_pack, _TwCache)
from watfft_tpu.bench.harness import time_chain

TOTAL = 1 << 21


@functools.partial(jax.jit, static_argnames=("n", "inverse", "tile_b", "use3d"))
def _call(xre, xim, twre, twim, n, inverse, tile_b, use3d):
    b = xre.shape[-1]
    stages = tuple(stage_plan(n))
    offsets = make_twiddle_pack(n, inverse)[2]
    kernel = functools.partial(_kernel, n, inverse, offsets, stages, use3d)
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


def probe(n, tile_b, use3d, reps=7):
    b = max(128, TOTAL // n)
    if tile_b > b or b % tile_b:
        return None
    if use3d and (tile_b < 1024 or tile_b % 8):
        return None
    rng = np.random.default_rng(0)
    xre = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    fre, fim = (jnp.asarray(a) for a in _TwCache.get(n, False))
    ire, iim = (jnp.asarray(a) for a in _TwCache.get(n, True))

    def step(c):
        a, bb = c
        a, bb = _call(a, bb, fre, fim, n, False, tile_b, use3d)
        return _call(a, bb, ire, iim, n, True, tile_b, use3d)

    ts = sorted(time_chain(step, (xre, xim)) for _ in range(reps))
    med = ts[len(ts) // 2]
    return med, ts[0]


def main(sizes):
    print(f"platform={jax.devices()[0].platform}")
    for n in sizes:
        for tile in (256, 512, 1024, 2048, 4096):
            for use3d in (False, True):
                r = probe(n, tile, use3d)
                if r is None:
                    continue
                med, best = r
                print(f"  n={n:<6} tile={tile:<5} 3d={int(use3d)}  "
                      f"med={med*1e6:7.1f}us  best={best*1e6:7.1f}us",
                      flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [64, 256])
