#!/usr/bin/env python
"""Full in-process decomposition of the real-4096 bench row.

Cross-process absolute drift hit 2x between probe sessions (probe_real4096
measured the same composition 142us that the bench measured 68us; the
bare-core probe then read 39us for the m=2048 complex core) — so this
probe times EVERY component in ONE process, interleaved:

  bare:   complex m=2048 core roundtrip (no real-path machinery)
  cores:  _rfft_core_call + _irfft_core_call (in-kernel deint/reint)
  hyb:    hybrid roundtrip (cores + XLA Hermitian passes)
  fused:  single-pass fused kernels (MXU mirror, [m+1] blocks)
  bench:  fused fwd + hybrid inv (current dispatch)
  jnp:    jnp.fft.rfft+irfft (batch-major)

Usage: python tools/probe_real4096d.py [--reps 5] [--n 4096] [--b 512]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu.bench.harness import ChainTimer, enable_compile_cache
from watfft_tpu.ops import pallas_rfft as pr
from watfft_tpu.ops.pallas_stockham import _pick_tile, _TwCache
from tools.probe_plans import pack_for_plan
from tools.probe_plans2 import _call2d


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
    cre = jnp.asarray(rng.uniform(-1, 1, (m, b)).astype(np.float32))
    cim = jnp.asarray(rng.uniform(-1, 1, (m, b)).astype(np.float32))
    xbm = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

    tile_b = _pick_tile(m, b)
    if b % tile_b != 0:
        tile_b = 128
    fre, fim = (jnp.asarray(a) for a in _TwCache.get(m, False))
    ire, iim = (jnp.asarray(a) for a in _TwCache.get(m, True))

    from watfft_tpu.ops.pallas_stockham import stage_plan
    plan = tuple(stage_plan(m))
    packs = {}
    for inv in (False, True):
        re_, im_, off = pack_for_plan(m, plan, inv)
        packs[inv] = (jnp.asarray(re_), jnp.asarray(im_), tuple(off))

    def bare(c):
        a, bb = c
        pre, pim, poff = packs[False]
        a, bb = _call2d(a, bb, pre, pim, m, False, tile_b, plan, poff)
        qre, qim, qoff = packs[True]
        return _call2d(a, bb, qre, qim, m, True, tile_b, plan, qoff)

    def cores(c):
        zre, zim = pr._rfft_core_call(c, fre, fim, None, n, tile_b)
        return pr._irfft_core_call(zre, zim, ire, iim, None, n, tile_b)

    def hyb(c):
        re_, im_ = pr._rfft_impl(c)
        return pr._irfft_impl(re_, im_)

    def fused(c):
        re_, im_ = pr._rfft_fused_impl(c)
        return pr._irfft_fused_impl(re_, im_)

    def bench(c):
        re_, im_ = pr._rfft_fused_impl(c)
        return pr._irfft_impl(re_, im_)

    def jnpstep(c):
        return jnp.fft.irfft(jnp.fft.rfft(c), n=n)

    chains = {
        "bare-core": (bare, (cre, cim)),
        "cores(deint/reint)": (cores, x),
        "hyb": (hyb, x),
        "fused": (fused, x),
        "bench(fusedF+hybI)": (bench, x),
        "jnp": (jnpstep, xbm),
    }
    timers = {}
    for k, (f, args) in chains.items():
        timers[k] = ChainTimer(f, args)
        timers[k].calibrate()
    ts = {k: [] for k in chains}
    for _ in range(reps):
        for k, t_ in timers.items():
            ts[k].append(t_.slope())
    tb = med(ts["bare-core"])
    for k in chains:
        t = med(ts[k])
        print(f"  {k:<20} {t*1e6:7.1f} us/roundtrip  vs bare x{t/tb:.2f}  "
              f"({b / t / 1e6:6.2f}M tr/s)", flush=True)


if __name__ == "__main__":
    main()
