"""Flagship Pallas kernel: batched Stockham radix-4 FFT, VMEM-resident.

The TPU-native re-axing of wat-fft's split-format radix-4 core
(modules/fft_split_native_f32.wat:748-1158): where the reference packs 4
complex values per v128 and feeds per-lane twiddles through 4x4 transposes,
this kernel puts the BATCH on the 128-lane axis and the transform length on
the sublane-major axis, so every butterfly is a full-width vector op with
zero lane shuffles (SURVEY.md §7 design stance). Mirrored features:

* split re/im planes end-to-end (fft_split_native_f32.wat:2-5)
* host-precomputed per-stage twiddle columns staged once into VMEM
  (analog of precompute_twiddles_split :151-192)
* twiddle-free lead stages: the radix-2 lead for odd log2(n)
  ($stage_r2_lead :710-743) and the l=1 radix-4 first stage
* native inverse: conjugated twiddle tables + sign-flipped -i rotations,
  with 1/n folded into the FINAL stage (the dual module folds 1/n into the
  final butterfly, fft_stockham_f32_dual.wat:1336-1337) — identical pass
  count to forward
* all stages ping-pong between VMEM values (the A/B buffer analog,
  fft_split_native_f32.wat:7-19) — one HBM read + one HBM write total.

Data layout: planes [n, batch] ("time-major"), batch on lanes. The Stockham
stage stores C[j*l + k] = FFT_l(x[j::r])[k]; each stage combines 4 contiguous
row-blocks and interleaves l-row groups — pure sublane movement.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stockham_fft_nb", "make_twiddle_pack", "stage_plan"]


def stage_plan(n: int) -> list[tuple[str, int]]:
    """Stage sequence: optional radix-2 lead (odd log2 n), then radix-4
    stages with l = lead, 4*lead, ... Each entry is (kind, l)."""
    m = n.bit_length() - 1
    stages: list[tuple[str, int]] = []
    l = 1
    if m % 2 == 1:
        stages.append(("r2", 1))
        l = 2
    while l < n:
        stages.append(("r4", l))
        l *= 4
    return stages


def make_twiddle_pack(n: int, inverse: bool) -> tuple[np.ndarray, np.ndarray, list[int]]:
    """Pack per-stage twiddle columns w_{4l}^{p*(row mod l)} for p=1,2,3 into
    [total, 1] f32 planes (f64 host math). Returns (re, im, offsets) where
    offsets[i] is the row offset of stage i's block (3*(n/4) rows per
    twiddled stage). The final stage's twiddles carry the folded 1/n for the
    inverse. l==1 stages are twiddle-free and get no block."""
    sign = +1.0 if inverse else -1.0
    res, ims, offsets = [], [], []
    off = 0
    stages = stage_plan(n)
    for idx, (kind, l) in enumerate(stages):
        if kind != "r4" or l == 1:
            offsets.append(-1)
            continue
        rows = n // 4
        k = np.arange(rows) % l
        scale = (1.0 / n) if (inverse and idx == len(stages) - 1) else 1.0
        for p in (1, 2, 3):
            ang = sign * 2.0 * np.pi * p * k / (4 * l)
            res.append((scale * np.cos(ang)).astype(np.float32))
            ims.append((scale * np.sin(ang)).astype(np.float32))
        offsets.append(off)
        off += 3 * rows
    if not res:  # tiny n: single twiddle-free stage; keep a dummy row
        res, ims = [np.ones(1, np.float32)], [np.zeros(1, np.float32)]
    re = np.concatenate(res).reshape(-1, 1)
    im = np.concatenate(ims).reshape(-1, 1)
    return re, im, offsets


def _r2_stage(cre, cim, n):
    h = n // 2
    ere, eim = cre[:h], cim[:h]
    ore, oim = cre[h:], cim[h:]
    ure, uim = ere + ore, eim + oim
    vre, vim = ere - ore, eim - oim
    # interleave single rows: [h, B] x2 -> [h, 2, B] -> [n, B]
    b = cre.shape[-1]
    out_re = _interleave([ure, vre], h, 1, b)
    out_im = _interleave([uim, vim], h, 1, b)
    return out_re, out_im


def _interleave(parts, g, l, b):
    """Stockham output permute: R parts of [g*l, b] -> [n, b] with rows
    j'*R*l + q*l + k. For l < 8 a [g, R, l, b] view would pad the sublane
    dim 8x in Mosaic's (8, 128) tiling; merging (l, b) into the minor dim
    keeps the pad at 2x (R=4 -> 8)."""
    n = len(parts) * g * l
    if l >= 8:
        out = jnp.stack([p.reshape(g, l, b) for p in parts], axis=1)
    else:
        out = jnp.stack([p.reshape(g, l * b) for p in parts], axis=1)
    return out.reshape(n, b)


def _r4_stage(cre, cim, n, l, tw, inverse, scale0):
    q = n // 4
    b = cre.shape[-1]
    bs_re = [cre[p * q:(p + 1) * q] for p in range(4)]
    bs_im = [cim[p * q:(p + 1) * q] for p in range(4)]
    if tw is not None:
        twre, twim = tw
        for p in (1, 2, 3):
            wr = twre[(p - 1) * q:p * q]
            wi = twim[(p - 1) * q:p * q]
            br, bi = bs_re[p], bs_im[p]
            bs_re[p] = br * wr - bi * wi
            bs_im[p] = br * wi + bi * wr
    if scale0 is not None:  # inverse final stage: fold 1/n into the p=0 term
        bs_re[0] = bs_re[0] * scale0
        bs_im[0] = bs_im[0] * scale0
        if tw is None:  # twiddle-free final stage: scale every term
            for p in (1, 2, 3):
                bs_re[p] = bs_re[p] * scale0
                bs_im[p] = bs_im[p] * scale0
    t0re, t0im = bs_re[0] + bs_re[2], bs_im[0] + bs_im[2]
    t1re, t1im = bs_re[0] - bs_re[2], bs_im[0] - bs_im[2]
    t2re, t2im = bs_re[1] + bs_re[3], bs_im[1] + bs_im[3]
    t3re, t3im = bs_re[1] - bs_re[3], bs_im[1] - bs_im[3]
    if not inverse:  # -i * t3 = (t3im, -t3re)
        rre, rim = t3im, -t3re
    else:            # +i * t3 = (-t3im, t3re)
        rre, rim = -t3im, t3re
    x0re, x0im = t0re + t2re, t0im + t2im
    x1re, x1im = t1re + rre, t1im + rim
    x2re, x2im = t0re - t2re, t0im - t2im
    x3re, x3im = t1re - rre, t1im - rim
    g = n // (4 * l)
    out_re = _interleave([x0re, x1re, x2re, x3re], g, l, b)
    out_im = _interleave([x0im, x1im, x2im, x3im], g, l, b)
    return out_re, out_im


def run_stages(cre, cim, n, inverse, offsets, stages, twre, twim,
               fold_scale: bool = True):
    """Run the full Stockham stage chain on [n, b] plane values.

    twre/twim: packed per-stage twiddle column values ([total, 1]).
    fold_scale: fold 1/n into the final stage for the inverse (native
    normalized inverse; set False when the caller folds scaling elsewhere,
    e.g. the irfft pre-process)."""
    inv_scale = jnp.float32(1.0 / n)
    for idx, (kind, l) in enumerate(stages):
        is_final = idx == len(stages) - 1
        do_scale = inverse and is_final and fold_scale
        if kind == "r2":
            cre, cim = _r2_stage(cre, cim, n)
            if do_scale:
                cre = cre * inv_scale
                cim = cim * inv_scale
            continue
        tw = None
        if offsets[idx] >= 0:
            o = offsets[idx]
            rows = 3 * (n // 4)
            tw = (twre[o:o + rows], twim[o:o + rows])
        scale0 = inv_scale if do_scale else None
        cre, cim = _r4_stage(cre, cim, n, l, tw, inverse, scale0)
    return cre, cim


def _kernel(n, inverse, offsets, stages,
            xre_ref, xim_ref, twre_ref, twim_ref, ore_ref, oim_ref):
    cre, cim = run_stages(xre_ref[:], xim_ref[:], n, inverse, offsets, stages,
                          twre_ref[:], twim_ref[:])
    ore_ref[:] = cre
    oim_ref[:] = cim


@functools.partial(jax.jit, static_argnames=("n", "inverse", "tile_b", "interpret"))
def _stockham_call(xre, xim, twre, twim, n, inverse, tile_b, interpret=False):
    b = xre.shape[-1]
    stages = tuple(stage_plan(n))
    offsets = make_twiddle_pack(n, inverse)[2]
    kernel = functools.partial(_kernel, n, inverse, offsets, stages)
    grid = (b // tile_b,)
    block = pl.BlockSpec((n, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, b), xre.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block, block, twspec, twspec],
        out_specs=[block, block],
        out_shape=[out_shape, out_shape],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xre, xim, twre, twim)


class _TwCache:
    """Caches HOST (numpy) twiddle packs only. Device arrays must not be
    cached: an array created while tracing (e.g. inside a user's jit/fori
    chain) is a tracer, and caching it leaks it across traces. numpy args
    become baked constants under an outer jit, which is what we want."""

    _cache: dict = {}

    @classmethod
    def get(cls, n, inverse):
        key = (n, inverse)
        if key not in cls._cache:
            re, im, _ = make_twiddle_pack(n, inverse)
            cls._cache[key] = (re, im)
        return cls._cache[key]


def _pick_tile(n: int, b: int) -> int:
    """Lane-tile so peak VMEM stays under the 16 MB limit. Measured: the
    value-style stage pipeline keeps ~17 [n, tb] f32 arrays live (stage
    temporaries + double-buffered in/out blocks), so keep n*tb <= 128K
    elements (~8.5 MB peak). n >= 2048 drops below full lane width — the
    large-n path should switch to the two-pass four-step instead."""
    max_elems = 128 * 1024
    tb = max(128, min(512, max_elems // n))  # lane blocks must be >=128
    # round down to a power of two <= b
    while tb > b:
        tb //= 2
    return tb


def stockham_fft_nb(xre, xim, inverse: bool = False):
    """Batched FFT on time-major planes [n, batch] (batch on lanes).

    batch must be a multiple of 128 (pad at the caller). Returns planes in
    the same layout. f32 only — this is the TPU-native hot path.
    """
    n, b = xre.shape[-2], xre.shape[-1]
    if b % 128 != 0:
        raise ValueError(f"batch (last axis) must be a multiple of 128, got {b}")
    twre, twim = _TwCache.get(n, inverse)
    tile_b = _pick_tile(n, b)
    if b % tile_b != 0:
        tile_b = 128
    interpret = jax.default_backend() != "tpu"
    return _stockham_call(xre, xim, twre, twim, n, inverse, tile_b,
                          interpret=interpret)
