#!/usr/bin/env python
"""Decompose the real-4096 bench row (the weakest in the real sweep).

At n=4096 the sweep batch is b=512, so W=64 < 128 forces the 2D path —
the only size in the sweep off the native 3D layout. The bench roundtrip
(fused fwd + hybrid inv) runs ~68us vs jnp ~173us (x2.53, vs x7.05 at
2048). This probe decomposes the roundtrip into closed chains (no
artificial consumers — every composition is its own inverse-shaped
consumer) to find where the time goes:

  bench:   fused fwd -> hybrid inv      (current dispatch)
  hyb:     hybrid fwd -> hybrid inv
  fused:   fused fwd -> fused inv
  core:    core fwd -> core inv         (no Hermitian passes; the floor
                                         of the hybrid structure)

Usage: python tools/probe_real4096.py [--reps 5] [--n 4096] [--b 512]
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
from watfft_tpu.ops.pallas_stockham import _pick_tile, _TwCache


def med(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    enable_compile_cache()
    argv = sys.argv
    reps = int(argv[argv.index("--reps") + 1]) if "--reps" in argv else 5
    n = int(argv[argv.index("--n") + 1]) if "--n" in argv else 4096
    b = int(argv[argv.index("--b") + 1]) if "--b" in argv else 512
    m = n // 2
    print(f"platform={jax.devices()[0].platform} n={n} b={b}", flush=True)

    rng = np.random.default_rng(46)
    x = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))

    tile_b = _pick_tile(m, b)
    if b % tile_b != 0:
        tile_b = 128
    fre, fim = (jnp.asarray(a) for a in _TwCache.get(m, False))
    ire, iim = (jnp.asarray(a) for a in _TwCache.get(m, True))

    def core_round(c):
        zre, zim = pr._rfft_core_call(c, fre, fim, None, n, tile_b)
        return pr._irfft_core_call(zre, zim, ire, iim, None, n, tile_b)

    def hyb_round(c):
        re, im = pr._rfft_impl(c)
        return pr._irfft_impl(re, im)

    def fused_round(c):
        re, im = pr._rfft_fused_impl(c)
        return pr._irfft_fused_impl(re, im)

    def bench_round(c):
        re, im = pr._rfft_fused_impl(c)
        return pr._irfft_impl(re, im)

    def mixed_round(c):
        re, im = pr._rfft_impl(c)
        return pr._irfft_fused_impl(re, im)

    # correctness gate: every roundtrip must reproduce x
    for name, f in (("core", core_round), ("hyb", hyb_round),
                    ("fused", fused_round), ("bench", bench_round)):
        err = float(jnp.max(jnp.abs(f(x) - x)))
        print(f"  roundtrip {name}: max err {err:.2e}", flush=True)
        assert err < 1e-4, name

    chains = {
        "bench(fusedF+hybI)": bench_round,
        "hyb(hybF+hybI)": hyb_round,
        "fused(fusedF+fusedI)": fused_round,
        "mixed(hybF+fusedI)": mixed_round,
        "core(no hermitian)": core_round,
    }
    timers = {}
    for k, f in chains.items():
        timers[k] = ChainTimer(f, x)
        timers[k].calibrate()
    ts = {k: [] for k in chains}
    for _ in range(reps):
        for k, t_ in timers.items():
            ts[k].append(t_.slope())
    for k in chains:
        t = med(ts[k])
        print(f"  {k:<22} {t*1e6:7.1f} us/roundtrip  "
              f"({b / t / 1e6:6.2f}M tr/s)", flush=True)


if __name__ == "__main__":
    main()
