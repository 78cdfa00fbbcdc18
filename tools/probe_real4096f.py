#!/usr/bin/env python
"""Ablation ladder for the real-path 2D kernel tax at [4096, 512].

probe_real4096d: cores(deint/reint) = 3.43x the bare complex core.
probe_real4096e: swapping the parity select for HIGHEST-precision MXU
selection dots recovered only 1.15x. Remaining suspects, one rung each:

  A bare          2 plane inputs, stages only (reference)
  B bigblk-contig ONE [n, tile] input, CONTIGUOUS halves split (no parity
                  select) -> isolates the single-big-block/merge cost
  C bigblk-parity = production cores: reshape parity select + stack merge
  D bigblk-mxuHST MXU selection dots at HIGHEST (6-pass)
  E bigblk-mxuHI  MXU selection dots at HIGH (3-pass bf16x3 — EXACT for
                  0/1 selection: the one-hot dot sums the 3 exact bf16
                  splits of a single f32 element)
  F fused-mxuHI   full fused kernels: MXU deint at HIGH + mirror at HIGH
                  + Hermitian + [m+1]-row output blocks
  G fused-mxuHI8  same as F but [m+8]-row output blocks (sublane-aligned;
                  ends live in rows m..m+1, caller slices)

Usage: python tools/probe_real4096f.py [--reps 5] [--n 4096] [--b 512]
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
                                            run_stages, _TwCache)
from tools.probe_plans import pack_for_plan
from tools.probe_plans2 import _call2d
from tools.probe_real4096e import _deint_matrix


def _dot(prec):
    if prec == "bf16x3":
        return _dot3
    return functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


_DOT_DEFAULT = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.DEFAULT,
)


def _dot3(dm, x):
    """Exact 0/1-selection dot in 3 single-pass bf16 dots (Mosaic lowers
    only DEFAULT/HIGHEST in-kernel; HIGHEST is 6 passes). The matrix is
    exact in bf16; the data splits exactly into 3 bf16 parts (8+8+8 >= 24
    mantissa bits), and each one-hot row sums the parts of ONE element in
    the f32 accumulator — exact."""
    db = dm.astype(jnp.bfloat16)
    xh = x.astype(jnp.bfloat16)
    r1 = x - xh.astype(jnp.float32)
    xm = r1.astype(jnp.bfloat16)
    xl = (r1 - xm.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = _DOT_DEFAULT(db, xh)
    acc = acc + _DOT_DEFAULT(db, xm)
    return acc + _DOT_DEFAULT(db, xl)


def _split(method, x, n, dm, dot):
    m = n // 2
    if method == "contig":
        return x[:m], x[m:]
    if method == "parity":
        xv = x.reshape(m, 2, x.shape[-1])
        return xv[:, 0, :], xv[:, 1, :]
    # mxu
    g = dm.shape[0]
    h = g // 2
    res, ims = [], []
    for p in range(n // g):
        blk = dot(dm, x[p * g:(p + 1) * g])
        res.append(blk[:h])
        ims.append(blk[h:])
    return jnp.concatenate(res, axis=0), jnp.concatenate(ims, axis=0)


def _merge(method, zre, zim, n, dmt, dot):
    if method == "contig":
        return jnp.concatenate([zre, zim], axis=0)
    if method == "parity":
        s = zre.shape
        return jnp.stack([zre, zim], axis=1).reshape(n, s[-1])
    g = dmt.shape[0]
    h = g // 2
    parts = []
    for p in range(n // g):
        pair = jnp.concatenate([zre[p * h:(p + 1) * h],
                                zim[p * h:(p + 1) * h]], axis=0)
        parts.append(dot(dmt, pair))
    return jnp.concatenate(parts, axis=0)


def make_bigblk(n, tile_b, method, prec, interpret):
    m = n // 2
    stages = tuple(stage_plan(m))
    off_f = make_twiddle_pack(m, False)[2]
    off_i = make_twiddle_pack(m, True)[2]
    dot = _dot(prec)
    dm = _deint_matrix(128)

    def kf(x_ref, twre_ref, twim_ref, dm_ref, zre_ref, zim_ref):
        zre, zim = _split(method, x_ref[:], n, dm_ref[:], dot)
        zre, zim = run_stages(zre, zim, m, False, off_f, stages,
                              twre_ref[:], twim_ref[:])
        zre_ref[:] = zre
        zim_ref[:] = zim

    def ki(zre_ref, zim_ref, twre_ref, twim_ref, dmt_ref, o_ref):
        zre, zim = run_stages(zre_ref[:], zim_ref[:], m, True, off_i, stages,
                              twre_ref[:], twim_ref[:])
        o_ref[:] = _merge(method, zre, zim, n, dmt_ref[:], dot)

    col = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    cp = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=config.VMEM_LIMIT_BYTES)

    @jax.jit
    def fwd(x, twre, twim, dmj):
        b = x.shape[-1]
        grid = (b // tile_b,)
        xb = pl.BlockSpec((n, tile_b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
        zb = pl.BlockSpec((m, tile_b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
        zs = jax.ShapeDtypeStruct((m, b), x.dtype)
        return pl.pallas_call(
            kf, grid=grid, in_specs=[xb, col(twre), col(twim), col(dmj)],
            out_specs=[zb, zb], out_shape=[zs, zs],
            compiler_params=cp, interpret=interpret)(x, twre, twim, dmj)

    @jax.jit
    def inv(zre, zim, twre, twim, dmt):
        b = zre.shape[-1]
        grid = (b // tile_b,)
        zb = pl.BlockSpec((m, tile_b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
        ob = pl.BlockSpec((n, tile_b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            ki, grid=grid,
            in_specs=[zb, zb, col(twre), col(twim), col(dmt)],
            out_specs=ob, out_shape=jax.ShapeDtypeStruct((n, b), zre.dtype),
            compiler_params=cp, interpret=interpret)(zre, zim, twre, twim, dmt)

    twf = _TwCache.get(m, False)
    twi = _TwCache.get(m, True)

    def step(c):
        zre, zim = fwd(c, jnp.asarray(twf[0]), jnp.asarray(twf[1]),
                       jnp.asarray(dm))
        return inv(zre, zim, jnp.asarray(twi[0]), jnp.asarray(twi[1]),
                   jnp.asarray(dm.T))

    return step


def make_fused(n, tile_b, prec, rows_pad, interpret):
    """Full fused rfft/irfft with MXU deint + mirror at `prec`; output
    spectrum planes carry m+rows_pad rows (rows m..m+rows_pad-1: row m is
    Nyquist, any further rows zero)."""
    m = n // 2
    mr = m + rows_pad
    stages = tuple(stage_plan(m))
    off_f = make_twiddle_pack(m, False)[2]
    off_i = make_twiddle_pack(m, True)[2]
    dot = _dot(prec)
    dm = _deint_matrix(128)
    mirror = dot  # the mirror matrix is 0/1 too — same exact-dot applies

    def mirror_rows(z, jblk, extra_row0=None):
        mm, _ = z.shape
        g = jblk.shape[0]
        nb = mm // g
        pieces = []
        for i in range(nb):
            blk = mirror(jblk, z[(nb - 1 - i) * g:(nb - i) * g])
            if i == 0 and extra_row0 is not None:
                pieces.append(extra_row0)
            else:
                src = ((nb - i) % nb) * g
                pieces.append(z[src:src + 1])
            pieces.append(blk[1:])
        return jnp.concatenate(pieces, axis=0)

    def kf(x_ref, twre_ref, twim_ref, wre_ref, wim_ref, jm_ref, dm_ref,
           ore_ref, oim_ref):
        b = x_ref.shape[-1]
        zre, zim = _split("mxu", x_ref[:], n, dm_ref[:], dot)
        zre, zim = run_stages(zre, zim, m, False, off_f, stages,
                              twre_ref[:], twim_ref[:])
        jm = jm_ref[:]
        bre = mirror_rows(zre, jm)
        bim = mirror_rows(zim, jm)
        ere = 0.5 * (zre + bre)
        eim = 0.5 * (zim - bim)
        ore = 0.5 * (zim + bim)
        oim = -0.5 * (zre - bre)
        wr = wre_ref[0:m]
        wi = wim_ref[0:m]
        ore_ref[0:m, :] = ere + wr * ore - wi * oim
        oim_ref[0:m, :] = eim + wr * oim + wi * ore
        ny = zre[0:1] - zim[0:1]
        zpad = jnp.zeros((rows_pad, b), x_ref.dtype)
        if rows_pad == 1:
            ore_ref[m:mr, :] = ny
        else:
            ore_ref[m:mr, :] = jnp.concatenate(
                [ny, jnp.zeros((rows_pad - 1, b), x_ref.dtype)], axis=0)
        oim_ref[m:mr, :] = zpad

    def ki(xre_ref, xim_ref, twre_ref, twim_ref, wre_ref, wim_ref, jm_ref,
           dmt_ref, o_ref):
        are = xre_ref[0:m]
        aim = xim_ref[0:m]
        jm = jm_ref[:]
        bre = mirror_rows(xre_ref[0:m], jm, extra_row0=xre_ref[m:m + 1])
        bim = -mirror_rows(xim_ref[0:m], jm, extra_row0=xim_ref[m:m + 1])
        ere = 0.5 * (are + bre)
        eim = 0.5 * (aim + bim)
        ore = -0.5 * (aim - bim)
        oim = 0.5 * (are - bre)
        wr = wre_ref[0:m]
        wi = wim_ref[0:m]
        zre = ere + wr * ore - wi * oim
        zim = eim + wr * oim + wi * ore
        zre, zim = run_stages(zre, zim, m, True, off_i, stages,
                              twre_ref[:], twim_ref[:])
        o_ref[:] = _merge("mxu", zre, zim, n, dmt_ref[:], dot)

    col = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    cp = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=config.VMEM_LIMIT_BYTES)

    @jax.jit
    def fwd(x, twre, twim, wre, wim, jm, dmj):
        b = x.shape[-1]
        grid = (b // tile_b,)
        xb = pl.BlockSpec((n, tile_b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
        ob = pl.BlockSpec((mr, tile_b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
        os_ = jax.ShapeDtypeStruct((mr, b), x.dtype)
        return pl.pallas_call(
            kf, grid=grid,
            in_specs=[xb, col(twre), col(twim), col(wre), col(wim), col(jm),
                      col(dmj)],
            out_specs=[ob, ob], out_shape=[os_, os_],
            compiler_params=cp, interpret=interpret)(
                x, twre, twim, wre, wim, jm, dmj)

    @jax.jit
    def inv(xre, xim, twre, twim, wre, wim, jm, dmt):
        b = xre.shape[-1]
        grid = (b // tile_b,)
        xb = pl.BlockSpec((mr, tile_b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
        ob = pl.BlockSpec((n, tile_b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            ki, grid=grid,
            in_specs=[xb, xb, col(twre), col(twim), col(wre), col(wim),
                      col(jm), col(dmt)],
            out_specs=ob, out_shape=jax.ShapeDtypeStruct((n, b), xre.dtype),
            compiler_params=cp, interpret=interpret)(
                xre, xim, twre, twim, wre, wim, jm, dmt)

    twf = _TwCache.get(m, False)
    twi = _TwCache.get(m, True)
    wf = pr._Cache.get(n, False)
    wi_ = pr._Cache.get(n, True)
    jmh = pr._JCache.get(m)

    def step(c):
        sre, sim = fwd(c, jnp.asarray(twf[0]), jnp.asarray(twf[1]),
                       jnp.asarray(wf[0]), jnp.asarray(wf[1]),
                       jnp.asarray(jmh), jnp.asarray(dm))
        return inv(sre, sim, jnp.asarray(twi[0]), jnp.asarray(twi[1]),
                   jnp.asarray(wi_[0]), jnp.asarray(wi_[1]),
                   jnp.asarray(jmh), jnp.asarray(dm.T))

    def fwd_only(x):
        return fwd(x, jnp.asarray(twf[0]), jnp.asarray(twf[1]),
                   jnp.asarray(wf[0]), jnp.asarray(wf[1]),
                   jnp.asarray(jmh), jnp.asarray(dm))

    return step, fwd_only


def med(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    enable_compile_cache()
    argv = sys.argv
    reps = int(argv[argv.index("--reps") + 1]) if "--reps" in argv else 5
    n = int(argv[argv.index("--n") + 1]) if "--n" in argv else 4096
    b = int(argv[argv.index("--b") + 1]) if "--b" in argv else 512
    m = n // 2
    tile_b = 128
    interp = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    print(f"platform={jax.devices()[0].platform} n={n} b={b}", flush=True)

    rng = np.random.default_rng(46)
    xh = rng.uniform(-1, 1, (n, b)).astype(np.float32)
    x = jnp.asarray(xh)
    cre = jnp.asarray(rng.uniform(-1, 1, (m, b)).astype(np.float32))
    cim = jnp.asarray(rng.uniform(-1, 1, (m, b)).astype(np.float32))

    plan = tuple(stage_plan(m))
    packs = {}
    for invb in (False, True):
        re_, im_, off = pack_for_plan(m, plan, invb)
        packs[invb] = (jnp.asarray(re_), jnp.asarray(im_), tuple(off))

    def bare(c):
        a, bb = c
        fre, fim, foff = packs[False]
        a, bb = _call2d(a, bb, fre, fim, m, False, tile_b, plan, foff)
        ire, iim, ioff = packs[True]
        return _call2d(a, bb, ire, iim, m, True, tile_b, plan, ioff)

    H = jax.lax.Precision.HIGHEST
    fused3, fused3_fwd = make_fused(n, tile_b, "bf16x3", 1, interp)
    fused38, _ = make_fused(n, tile_b, "bf16x3", 8, interp)
    chains = {
        "A bare": (bare, (cre, cim)),
        "B bigblk-contig": (make_bigblk(n, tile_b, "contig", H, interp), x),
        "C bigblk-parity": (make_bigblk(n, tile_b, "parity", H, interp), x),
        "D bigblk-mxuHST": (make_bigblk(n, tile_b, "mxu", H, interp), x),
        "E bigblk-mxu3": (make_bigblk(n, tile_b, "mxu", "bf16x3", interp), x),
        "F fused-mxu3": (fused3, x),
        "G fused-mxu3p8": (fused38, x),
    }

    # correctness: F forward vs numpy; all x-carry roundtrips = identity
    sre, sim = fused3_fwd(x)
    ref = np.fft.rfft(xh.astype(np.float64), axis=0)
    errf = max(np.abs(np.asarray(sre)[:m + 1] - ref.real).max(),
               np.abs(np.asarray(sim)[:m + 1] - ref.imag).max()) / np.abs(ref).max()
    print(f"  fused-mxu3 fwd vs numpy: {errf:.2e}", flush=True)
    assert errf < 1e-5
    for k, (f, args) in chains.items():
        if k == "A bare":
            continue
        err = float(jnp.max(jnp.abs(f(args) - args)))
        print(f"  roundtrip {k}: {err:.2e}", flush=True)
        assert err < 1e-4, k

    timers = {}
    for k, (f, args) in chains.items():
        timers[k] = ChainTimer(f, args)
        timers[k].calibrate()
    ts = {k: [] for k in chains}
    for _ in range(reps):
        for k, t_ in timers.items():
            ts[k].append(t_.slope())
    tb = med(ts["A bare"])
    for k in chains:
        t = med(ts[k])
        print(f"  {k:<17} {t*1e6:7.1f} us/roundtrip  vs bare x{t/tb:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
