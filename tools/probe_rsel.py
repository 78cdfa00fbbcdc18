#!/usr/bin/env python
"""Exp 47 dispatch probe: MXU selection dots in the 2D real path.

probe_real4096f isolated the tax at [4096, 512]: the in-kernel parity
select costs 3.53x the whole core; exact bf16x3 selection dots cut the
roundtrip to 1.51x; a contiguous split would be free (x1.00) but the
rfft-via-half-complex decomposition inherently needs even/odd.

This probe measures the PRODUCTION candidates per size and direction on
the 2D [n, b] layout (b = 2^21/n, the Exp 35/41 shape), standalone chains
with unprunable consumers, interleaved in one process:

  hyb-par   current partial-fusion hybrid (parity select)
  hyb-mxu   hybrid with MXU bf16x3 deint/reint
  fus-par   fused kernel, parity select (mirror now bf16x3 everywhere)
  fus-mxu   fused kernel, MXU deint/reint + bf16x3 mirror

The winners set config.RFFT_FUSED_{FWD,INV}_SIZES (family) and
config.RFFT_MXU_SELECT_{FWD,INV}_SIZES (select method) — a re-validation
of the Exp 41 fused tables as well, since the mirror got 2x cheaper
(Exp 38's lesson: re-probe dispatch boundaries when shared machinery
changes).

Usage: python tools/probe_rsel.py [--reps 3] [--sizes 128,256,...]
       [--no-fused]
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

TOTAL = 1 << 21


def med(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    enable_compile_cache()
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sizes = [128, 256, 512, 1024, 2048, 4096, 8192, 16384]
    if "--sizes" in sys.argv:
        sizes = [int(s) for s in
                 sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    with_fused = "--no-fused" not in sys.argv
    total = TOTAL
    if "--total" in sys.argv:
        total = int(sys.argv[sys.argv.index("--total") + 1])
    if "--cpu" in sys.argv:  # smoke-testing off-chip (axon overrides env)
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(47)
    print(f"platform={jax.devices()[0].platform} sizes={sizes} reps={reps}",
          flush=True)

    ALL = frozenset(sizes)

    def hyb(x, mxu):
        config.RFFT_MXU_SELECT_FWD_SIZES = ALL if mxu else frozenset()
        return pr._rfft_impl(x)

    def ihyb(re, im, mxu):
        config.RFFT_MXU_SELECT_INV_SIZES = ALL if mxu else frozenset()
        return pr._irfft_impl(re, im)

    def fus(x, mxu):
        config.RFFT_MXU_SELECT_FWD_SIZES = ALL if mxu else frozenset()
        return pr._rfft_fused_impl(x)

    def ifus(re, im, mxu):
        config.RFFT_MXU_SELECT_INV_SIZES = ALL if mxu else frozenset()
        return pr._irfft_fused_impl(re, im)

    # correctness gate at the first size (on the real backend)
    n0 = sizes[0]
    x0 = rng.uniform(-1, 1, (n0, 256)).astype(np.float32)
    ref = np.fft.rfft(x0.astype(np.float64), axis=0)
    scale = np.abs(ref).max()
    for tag, f in (("hyb-mxu", lambda a: hyb(a, True)),
                   ("fus-mxu", lambda a: fus(a, True))):
        if tag.startswith("fus") and not with_fused:
            continue
        yre, yim = f(jnp.asarray(x0))
        err = max(np.abs(np.asarray(yre) - ref.real).max(),
                  np.abs(np.asarray(yim) - ref.imag).max()) / scale
        print(f"  {tag} n={n0} vs numpy rel {err:.2e}", flush=True)
        assert err < 1e-5, tag
        xi = ihyb(yre, yim, True) if tag == "hyb-mxu" else ifus(yre, yim, True)
        erri = np.abs(np.asarray(xi) - x0).max()
        print(f"  {tag.replace('-', '-i')} roundtrip {erri:.2e}", flush=True)
        assert erri < 1e-5, tag

    for n in sizes:
        b = max(128, total // n)
        m = n // 2
        x = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
        sre = jnp.asarray(rng.uniform(-1, 1, (m + 1, b)).astype(np.float32))
        sim = jnp.asarray(rng.uniform(-1, 1, (m + 1, b)).astype(np.float32))

        def fwd_chain(rf):
            def step(c):
                yre, yim = rf(c)
                upd = jnp.concatenate([yre, yim[1:]], axis=0)[:n]
                return c + upd * jnp.float32(1e-30)
            return step

        def inv_chain(rif):
            def step(c):
                re, im = c
                y = rif(re, im)
                upd = (y[:m + 1] + y[m - 1:]) * jnp.float32(1e-30)
                return re + upd, im
            return step

        cand_f = {
            "hyb-par": fwd_chain(lambda a: hyb(a, False)),
            "hyb-mxu": fwd_chain(lambda a: hyb(a, True)),
        }
        cand_i = {
            "hyb-par": inv_chain(lambda r, i: ihyb(r, i, False)),
            "hyb-mxu": inv_chain(lambda r, i: ihyb(r, i, True)),
        }
        if with_fused and n <= 8192:
            cand_f["fus-par"] = fwd_chain(lambda a: fus(a, False))
            cand_f["fus-mxu"] = fwd_chain(lambda a: fus(a, True))
            cand_i["fus-par"] = inv_chain(lambda r, i: ifus(r, i, False))
            cand_i["fus-mxu"] = inv_chain(lambda r, i: ifus(r, i, True))

        for tag, cands, args in (("fwd", cand_f, x),
                                 ("inv", cand_i, (sre, sim))):
            timers = {}
            for k, step in cands.items():
                timers[k] = ChainTimer(step, args)
                timers[k].calibrate()
            ts = {k: [] for k in cands}
            for _ in range(reps):
                for k, t_ in timers.items():
                    ts[k].append(t_.slope())
            t = {k: med(v) * 1e6 for k, v in ts.items()}
            best = min(t, key=t.get)
            row = "  ".join(f"{k} {v:7.1f}us" for k, v in t.items())
            print(f"n={n:<6} {tag}: {row}  -> {best}", flush=True)


if __name__ == "__main__":
    main()
