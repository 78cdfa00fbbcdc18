#!/usr/bin/env python
"""Exp 47 follow-up: mirror-dot precision A/B on the fused forward.

The Exp 47 landing switched the fused kernels' Hermitian-mirror 0/1 dots
from HIGHEST (6 bf16 passes) to bf16x3 (3 passes + a VPU split of the
operand: 2 subs + 3 casts over the full [m, b] block per plane). At
LARGE m the pass saving wins; at small m the split overhead may exceed
the tiny dot's saving — probe_rsel saw the n=256 fused fwd lose its
Exp 41 edge while 128/512+ improved.

Chains fused-fwd (parity select, so _sel_dot is used ONLY by the mirror)
with the module-level _sel_dot patched per variant, each variant traced
through a FRESH jax.jit of the raw (unjitted) call so the kernel actually
re-bakes (the production wrapper's jit cache would otherwise serve the
first-baked kernel to both variants).

Usage: python tools/probe_mirror_prec.py [--reps 5] [--sizes 128,256,...]
"""

import functools as ft
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu import config
from watfft_tpu.bench.harness import ChainTimer, enable_compile_cache
from watfft_tpu.ops import pallas_rfft as pr
from watfft_tpu.ops.pallas_stockham import _pick_tile as _pick_tile_c

TOTAL = 1 << 21


def med(xs):
    return sorted(xs)[len(xs) // 2]


def make_fused_fwd(n, b, dot_name):
    """Replicates _rfft_fused_impl's prep, but traces the raw call under a
    fresh jit with pr._sel_dot patched to the named dot."""
    m = n // 2
    from watfft_tpu.ops.pallas_stockham import make_twiddle_pack as mk
    wre, wim = (jnp.asarray(a) for a in pr._Cache.get(n, False))
    pk = mk(m, False)
    sre, sim = jnp.asarray(pk[0]), jnp.asarray(pk[1])
    jm = jnp.asarray(pr._JCache.get(m))
    tile_b = _pick_tile_c(n, b)
    if b % tile_b != 0:
        tile_b = 128
    raw = pr._rfft_fused_call.__wrapped__
    call = jax.jit(ft.partial(raw, n=n, tile_b=tile_b, interpret=False,
                              lc=False, mxu_sel=False))
    saved = pr._sel_dot

    def f(x):
        pr._sel_dot = (pr._sel_dot_exact if dot_name == "hst"
                       else saved)  # resolved at trace time inside raw
        try:
            return call(x, sre, sim, wre, wim, jm, None)
        finally:
            pr._sel_dot = saved
    return f


def main():
    enable_compile_cache()
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sizes = [128, 256, 512, 1024]
    if "--sizes" in sys.argv:
        sizes = [int(s) for s in
                 sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    rng = np.random.default_rng(48)
    print(f"platform={jax.devices()[0].platform} sizes={sizes}", flush=True)

    for n in sizes:
        b = max(128, TOTAL // n)
        x = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
        ref = np.fft.rfft(np.asarray(x, np.float64), axis=0)
        scale = np.abs(ref).max()
        variants = {k: make_fused_fwd(n, b, k) for k in ("bf16x3", "hst")}
        for k, f in variants.items():
            yre, yim = f(x)
            err = max(np.abs(np.asarray(yre) - ref.real).max(),
                      np.abs(np.asarray(yim) - ref.imag).max()) / scale
            assert err < 1e-5, (k, err)

        def chain(f):
            def step(c):
                yre, yim = f(c)
                upd = jnp.concatenate([yre, yim[1:]], axis=0)[:n]
                return c + upd * jnp.float32(1e-30)
            return step

        timers = {k: ChainTimer(chain(f), x) for k, f in variants.items()}
        for t_ in timers.values():
            t_.calibrate()
        ts = {k: [] for k in variants}
        for _ in range(reps):
            for k, t_ in timers.items():
                ts[k].append(t_.slope())
        r = med([h / b3 for b3, h in zip(ts["bf16x3"], ts["hst"])])
        print(f"n={n:<6} fused-fwd: bf16x3 {med(ts['bf16x3'])*1e6:7.1f}us  "
              f"hst {med(ts['hst'])*1e6:7.1f}us  hst/bf16x3={r:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
