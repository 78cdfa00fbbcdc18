#!/usr/bin/env python
"""Candidate fixes for the real-path deinterleave tax (probe_real4096d:
the in-kernel stride-2 row select + stack reinterleave cost 3.43x the
entire m=2048 core arithmetic at [4096, 512] — Mosaic lowers row-parity
selects as per-row sublane ops).

Variants, all roundtrip-closed and paired in ONE process:

  cur-fused : current dispatch (fused fwd + fused inv)
  xla-deint : deinterleave/reinterleave as XLA passes around the BARE
              complex kernel + XLA Hermitian passes (restructured hybrid)
  mxu-deint : fused kernels with the deinterleave/reinterleave done as
              blocked 0/1 MXU matmuls (the Hermitian-mirror trick, Exp 32):
              D[128,128] selects even rows into 0..63, odd into 64..127;
              one dot per 128-row block, exact at HIGHEST precision.

Usage: python tools/probe_real4096e.py [--reps 5] [--n 4096] [--b 512]
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
from watfft_tpu.bench.harness import ChainTimer, enable_compile_cache
from watfft_tpu.ops import pallas_rfft as pr
from watfft_tpu.ops.pallas_stockham import (stage_plan, make_twiddle_pack,
                                            run_stages, _pick_tile, _TwCache)
from tools.probe_plans import pack_for_plan
from tools.probe_plans2 import _call2d

_MD = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)


def _deint_matrix(g: int = 128) -> np.ndarray:
    """[g, g] 0/1: row t (t < g/2) selects input row 2t (even -> re half);
    row g/2+t selects input row 2t+1 (odd -> im half)."""
    d = np.zeros((g, g), np.float32)
    h = g // 2
    t = np.arange(h)
    d[t, 2 * t] = 1.0
    d[h + t, 2 * t + 1] = 1.0
    return d


def _rfft_fused_kernel_mxud(n, offsets, stages,
                            x_ref, twre_ref, twim_ref, wre_ref, wim_ref,
                            jm_ref, dm_ref, ore_ref, oim_ref):
    m = n // 2
    b = x_ref.shape[-1]
    x = x_ref[:]
    dm = dm_ref[:]
    g = dm.shape[0]
    h = g // 2
    zre_parts, zim_parts = [], []
    for p in range(n // g):
        blk = _MD(dm, x[p * g:(p + 1) * g])
        zre_parts.append(blk[:h])
        zim_parts.append(blk[h:])
    zre = jnp.concatenate(zre_parts, axis=0)
    zim = jnp.concatenate(zim_parts, axis=0)
    zre, zim = run_stages(zre, zim, m, False, offsets, stages,
                          twre_ref[:], twim_ref[:])
    jm = jm_ref[:]
    bre = pr._mirror_rows(zre, jm)
    bim = pr._mirror_rows(zim, jm)
    ere = 0.5 * (zre + bre)
    eim = 0.5 * (zim - bim)
    ore = 0.5 * (zim + bim)
    oim = -0.5 * (zre - bre)
    wr = wre_ref[0:m]
    wi = wim_ref[0:m]
    ore_ref[0:m, :] = ere + wr * ore - wi * oim
    oim_ref[0:m, :] = eim + wr * oim + wi * ore
    ore_ref[m:m + 1, :] = zre[0:1] - zim[0:1]
    oim_ref[m:m + 1, :] = jnp.zeros((1, b), x.dtype)


def _irfft_fused_kernel_mxud(n, offsets, stages,
                             xre_ref, xim_ref, twre_ref, twim_ref,
                             wre_ref, wim_ref, jm_ref, dmt_ref, o_ref):
    m = n // 2
    are = xre_ref[0:m]
    aim = xim_ref[0:m]
    jm = jm_ref[:]
    bre = pr._mirror_rows(xre_ref[0:m], jm, extra_row0=xre_ref[m:m + 1])
    bim = -pr._mirror_rows(xim_ref[0:m], jm, extra_row0=xim_ref[m:m + 1])
    ere = 0.5 * (are + bre)
    eim = 0.5 * (aim + bim)
    ore = -0.5 * (aim - bim)
    oim = 0.5 * (are - bre)
    wr = wre_ref[0:m]
    wi = wim_ref[0:m]
    zre = ere + wr * ore - wi * oim
    zim = eim + wr * oim + wi * ore
    zre, zim = run_stages(zre, zim, m, True, offsets, stages,
                          twre_ref[:], twim_ref[:])
    dmt = dmt_ref[:]
    g = dmt.shape[0]
    h = g // 2
    parts = []
    for p in range(n // g):
        pair = jnp.concatenate([zre[p * h:(p + 1) * h],
                                zim[p * h:(p + 1) * h]], axis=0)
        parts.append(_MD(dmt, pair))
    o_ref[:] = jnp.concatenate(parts, axis=0)


def _mxud_calls(n, tile_b, interpret=False):
    m = n // 2
    stages_f = tuple(stage_plan(m))
    off_f = make_twiddle_pack(m, False)[2]
    stages_i = tuple(stage_plan(m))
    off_i = make_twiddle_pack(m, True)[2]
    dm = _deint_matrix(128)

    kf = functools.partial(_rfft_fused_kernel_mxud, n, off_f, stages_f)
    ki = functools.partial(_irfft_fused_kernel_mxud, n, off_i, stages_i)

    col = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)

    @functools.partial(jax.jit, static_argnames=())
    def fwd(x, twre, twim, wre, wim, jm, dmj):
        b = x.shape[-1]
        grid = (b // tile_b,)
        xblock = pl.BlockSpec((n, tile_b), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        oblock = pl.BlockSpec((m + 1, tile_b), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((m + 1, b), x.dtype)
        return pl.pallas_call(
            kf, grid=grid,
            in_specs=[xblock, col(twre), col(twim), col(wre), col(wim),
                      col(jm), col(dmj)],
            out_specs=[oblock, oblock], out_shape=[out_shape, out_shape],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
            interpret=interpret,
        )(x, twre, twim, wre, wim, jm, dmj)

    @functools.partial(jax.jit, static_argnames=())
    def inv(xre, xim, twre, twim, wre, wim, jm, dmt):
        b = xre.shape[-1]
        grid = (b // tile_b,)
        xblock = pl.BlockSpec((m + 1, tile_b), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        oblock = pl.BlockSpec((n, tile_b), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            ki, grid=grid,
            in_specs=[xblock, xblock, col(twre), col(twim), col(wre),
                      col(wim), col(jm), col(dmt)],
            out_specs=oblock,
            out_shape=jax.ShapeDtypeStruct((n, b), xre.dtype),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
            interpret=interpret,
        )(xre, xim, twre, twim, wre, wim, jm, dmt)

    return fwd, inv, dm


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
    xh = rng.uniform(-1, 1, (n, b)).astype(np.float32)
    x = jnp.asarray(xh)

    tile_b = _pick_tile(m, b)
    if b % tile_b != 0:
        tile_b = 128

    # --- cur-fused ---------------------------------------------------------
    def cur(c):
        re_, im_ = pr._rfft_fused_impl(c)
        return pr._irfft_fused_impl(re_, im_)

    # --- xla-deint ---------------------------------------------------------
    plan = tuple(stage_plan(m))
    packs = {}
    for invb in (False, True):
        re_, im_, off = pack_for_plan(m, plan, invb)
        packs[invb] = (jnp.asarray(re_), jnp.asarray(im_), tuple(off))

    def xla_deint(c):
        xv = c.reshape(m, 2, b)
        zre, zim = xv[:, 0, :], xv[:, 1, :]
        fre, fim, foff = packs[False]
        zre, zim = _call2d(zre, zim, fre, fim, m, False, tile_b, plan, foff)
        sre, sim = pr.hermitian_post_nb(zre, zim, n)
        # inverse
        zre, zim = pr.hermitian_pre_nb(sre, sim, n)
        ire, iim, ioff = packs[True]
        yre, yim = _call2d(zre, zim, ire, iim, m, True, tile_b, plan, ioff)
        return jnp.stack([yre, yim], axis=1).reshape(n, b)

    # --- mxu-deint ---------------------------------------------------------
    interp = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    fwd, inv, dm = _mxud_calls(n, tile_b, interpret=interp)
    wre_f, wim_f = pr._Cache.get(n, False)
    wre_i, wim_i = pr._Cache.get(n, True)
    twf = _TwCache.get(m, False)
    twi = _TwCache.get(m, True)
    jmh = pr._JCache.get(m)
    # pass exactly what the production fused path passes (the kernels index
    # wre_ref[0:m]; forward tables are length m+1, inverse length m)
    wf = (wre_f, wim_f)
    wi = (wre_i, wim_i)

    def mxud(c):
        sre, sim = fwd(c, jnp.asarray(twf[0]), jnp.asarray(twf[1]),
                       jnp.asarray(wf[0]), jnp.asarray(wf[1]),
                       jnp.asarray(jmh), jnp.asarray(dm))
        return inv(sre, sim, jnp.asarray(twi[0]), jnp.asarray(twi[1]),
                   jnp.asarray(wi[0]), jnp.asarray(wi[1]),
                   jnp.asarray(jmh), jnp.asarray(dm.T))

    # correctness gates
    ref_s = np.fft.rfft(xh.astype(np.float64), axis=0)
    scale = np.abs(ref_s).max()
    sre, sim = fwd(x, jnp.asarray(twf[0]), jnp.asarray(twf[1]),
                   jnp.asarray(wf[0]), jnp.asarray(wf[1]),
                   jnp.asarray(jmh), jnp.asarray(dm))
    errf = max(np.abs(np.asarray(sre) - ref_s.real).max(),
               np.abs(np.asarray(sim) - ref_s.imag).max()) / scale
    print(f"  mxu-deint fwd vs numpy: {errf:.2e}", flush=True)
    assert errf < 1e-5
    for name, f in (("cur", cur), ("xla", xla_deint), ("mxud", mxud)):
        err = float(jnp.max(jnp.abs(f(x) - x)))
        print(f"  roundtrip {name}: {err:.2e}", flush=True)
        assert err < 1e-4, name

    chains = {"cur-fused": cur, "xla-deint": xla_deint, "mxu-deint": mxud}
    timers = {}
    for k, f in chains.items():
        timers[k] = ChainTimer(f, x)
        timers[k].calibrate()
    ts = {k: [] for k in chains}
    for _ in range(reps):
        for k, t_ in timers.items():
            ts[k].append(t_.slope())
    tb = med(ts["cur-fused"])
    for k in chains:
        t = med(ts[k])
        print(f"  {k:<12} {t*1e6:7.1f} us/roundtrip  ratio(cur/cand)="
              f"{tb/t:.3f}x  ({b / t / 1e6:6.2f}M tr/s)", flush=True)


if __name__ == "__main__":
    main()
