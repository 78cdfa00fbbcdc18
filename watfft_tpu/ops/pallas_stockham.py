"""Flagship Pallas kernel: batched mixed-radix Stockham FFT, VMEM-resident.

The TPU-native re-axing of wat-fft's split-format radix-4 core
(modules/fft_split_native_f32.wat:748-1158): where the reference packs 4
complex values per v128 and feeds per-lane twiddles through 4x4 transposes,
this kernel puts the BATCH on the 128-lane axis and the transform length on
the sublane-major axis, so every butterfly is a full-width vector op with
zero lane shuffles (SURVEY.md §7 design stance). Mirrored features:

* split re/im planes end-to-end (fft_split_native_f32.wat:2-5)
* host-precomputed per-stage twiddle columns staged once into VMEM
  (analog of precompute_twiddles_split :151-192)
* twiddle-free lead stage (l=1; generalizes $stage_r2_lead :710-743)
* native inverse: sign-flipped constants + conjugated twiddle tables with
  1/n folded into the FINAL stage (the dual module folds 1/n into the final
  butterfly, fft_stockham_f32_dual.wat:1336-1337) — identical pass count
* all stages ping-pong between VMEM values — one HBM read + one HBM write.

Radix choice (Exp 4): each Stockham stage pays one full interleave
(sublane permute) pass, and permutes dominate over butterfly arithmetic on
the VPU, so stages use the LARGEST radix available: n = 16^a * r with one
remainder stage r in {2,4,8}. The R-point butterfly across the R part
arrays is a recursive radix-2 network with scalar constant twiddles
(w_R^q), so a radix-16 stage does the arithmetic of two radix-4 stages but
only ONE memory permute.

Data layout: planes [n, batch] (batch on lanes). The Stockham invariant:
after a stage with cumulative length l, C[j*l + k] = FFT_l(x[j::n/l])[k];
each stage combines R contiguous row-blocks and interleaves l-row groups —
pure sublane movement.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config

__all__ = ["stockham_fft_nb", "stockham_fft_nb_postmul",
           "make_twiddle_pack", "stage_plan", "run_stages"]


# Measured per-size radix overrides (Exp 39, paired on-chip roundtrips):
# radix-32/64 stages trade butterfly arithmetic for interleave passes, and
# the balance is size-specific — (64,1),(32,64) at n=2048 won 1.55-2.0x
# paired (73.9 -> 36.7us), 4096 won 1.16x, 1024/32/8192 never lost
# (1.06-1.08x); at n=256 the same move LOSES (0.72-0.83x) so 256 keeps the
# radix-16 plan. The reference re-validates its codelet dispatch table per
# hardware generation the same way (fft_real_f32_dual.wat:2434-2443).
_PLAN_OVERRIDES: dict[int, tuple[int, ...]] = {
    32: (32,),
    1024: (64, 16),
    2048: (64, 32),
    4096: (64, 64),
    8192: (32, 16, 16),
}

# Layout-conditional overrides for the rank-3 DMA-3D kernels (Exp 46): plan
# economics differ per layout because interleave passes relayout different
# minors. At n=512 the two-stage 16*32 plan wins 1.18x paired on the 3D
# layout (47.2 vs 54.7us roundtrip) but LOSES 0.94x on the 2D layout
# (77.4 vs 72.9us), so the override applies only when three_d is set.
_PLAN_OVERRIDES_3D: dict[int, tuple[int, ...]] = {
    512: (16, 32),
}


def stage_plan(n: int, three_d: bool = False) -> list[tuple[int, int]]:
    """Stage sequence as (R, l) pairs. Default rule: radix-16 stages plus one
    {2,4,8} remainder stage — radix-8 leads (twiddle-free, pad-free at l=1,
    Exp 15); radix-2/4 sit at position 1 (l=16) so their interleave views
    keep a >=8-sized second-minor dim. Per-size measured overrides with
    radix-32/64 stages where they won paired on-chip (_PLAN_OVERRIDES,
    Exp 39); three_d selects the rank-3 DMA-3D kernels' table
    (_PLAN_OVERRIDES_3D, Exp 46) where plan economics differ per layout."""
    if three_d and n in _PLAN_OVERRIDES_3D:
        radices = list(_PLAN_OVERRIDES_3D[n])
    elif n in _PLAN_OVERRIDES:
        radices = list(_PLAN_OVERRIDES[n])
    else:
        m = n.bit_length() - 1
        radices = []
        while m >= 4:
            radices.append(16)
            m -= 4
        if m:
            rem = 1 << m
            if not radices:
                radices.append(rem)          # tiny n: single stage
            elif rem == 8:
                # radix-8 first: its l=1 stage is twiddle-free AND its
                # [g, 8, b] merged interleave has no sublane pad — 83 -> 72us
                # at n=2048 (Exp 15). rem 2/4 first would pad 4x/2x on a
                # full-size early stage (184us/163us measured) so they stay
                # at position 1.
                radices.insert(0, rem)
            else:
                radices.insert(1, rem)
    stages = []
    l = 1
    for r in radices:
        stages.append((r, l))
        l *= r
    return stages


def make_twiddle_pack(n: int, inverse: bool,
                      three_d: bool = False) -> tuple[np.ndarray, np.ndarray, list[int]]:
    """Pack per-stage twiddle columns w_{R*l}^{p*(row mod l)}, p=1..R-1, into
    [total, 1] f32 planes (f64 host math, phases reduced mod R*l). offsets[i]
    = row offset of stage i's block ((R-1)*(n/R) rows); -1 for the
    twiddle-free l==1 stage. The final stage carries the folded 1/n for the
    inverse. three_d follows stage_plan's layout-conditional table."""
    sign = +1.0 if inverse else -1.0
    res, ims, offsets = [], [], []
    off = 0
    stages = stage_plan(n, three_d)
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
    if not res:  # single twiddle-free stage; keep a dummy row
        res, ims = [np.ones(1, np.float32)], [np.zeros(1, np.float32)]
    re = np.concatenate(res).reshape(-1, 1)
    im = np.concatenate(ims).reshape(-1, 1)
    return re, im, offsets


def _interleave(parts, g, l, b):
    """Stockham output permute: R parts of [g*l, b] -> [n, b] with rows
    j'*R*l + q*l + k. For l*(second-minor) < 8 a [g, R, l, b] view would pad
    the sublane dim up to 8x in Mosaic's (8, 128) tiling; merging (l, b)
    into the minor dim keeps the pad bounded by the R dim instead."""
    n = len(parts) * g * l
    if l >= 8:
        out = jnp.stack([p.reshape(g, l, b) for p in parts], axis=1)
    else:
        out = jnp.stack([p.reshape(g, l * b) for p in parts], axis=1)
    return out.reshape(n, b)


def _interleave3(parts, g, l, s, w):
    """3D variant: parts of [g*l, s, w] -> [n, s, w]. The tiled minor pair
    (s, w) = (8, lanes) stays intact, so NO view ever pads regardless of l
    (the small-n fix, Exp 10)."""
    n = len(parts) * g * l
    out = jnp.stack([p.reshape(g, l, s, w) for p in parts], axis=1)
    return out.reshape(n, s, w)


def _small_dft(res, ims, inverse: bool):
    """R-point DFT across R part-arrays via a recursive radix-2 network with
    scalar constant twiddles. X_q = sum_p part_p * w_R^{p*q},
    w_R = exp(-+2i pi / R). R must be a power of two."""
    r = len(res)
    if r == 1:
        return res, ims
    ere, eim = _small_dft(res[0::2], ims[0::2], inverse)
    ore, oim = _small_dft(res[1::2], ims[1::2], inverse)
    half = r // 2
    sign = +1.0 if inverse else -1.0
    out_re = [None] * r
    out_im = [None] * r
    for q in range(half):
        ang = sign * 2.0 * math.pi * q / r
        wr, wi = math.cos(ang), math.sin(ang)
        orq, oiq = ore[q], oim[q]
        if q == 0:  # w = 1
            tre, tim = orq, oiq
        elif 4 * q == r:  # w = -+i: (re,im) -> (+-im, -+re)
            if inverse:
                tre, tim = -oiq, orq
            else:
                tre, tim = oiq, -orq
        else:
            # python-float scalars are weak-typed: they follow the array
            # dtype (f32 tier stays f32; the bf16 compute tier stays bf16
            # instead of promoting every butterfly product to f32)
            tre = orq * wr - oiq * wi
            tim = orq * wi + oiq * wr
        out_re[q] = ere[q] + tre
        out_im[q] = eim[q] + tim
        out_re[q + half] = ere[q] - tre
        out_im[q + half] = eim[q] - tim
    return out_re, out_im


def _stage(cre, cim, n, r, l, tw, inverse, scale0):
    """One mixed-radix Stockham stage on [n, b] (2D) or [n, 8, w] (3D)
    values. All arithmetic is elementwise/rank-agnostic; only the twiddle
    broadcast and output interleave depend on rank."""
    q = n // r
    three_d = cre.ndim == 3
    bs_re = [cre[p * q:(p + 1) * q] for p in range(r)]
    bs_im = [cim[p * q:(p + 1) * q] for p in range(r)]
    if tw is not None:
        twre, twim = tw
        for p in range(1, r):
            wr = twre[(p - 1) * q:p * q]
            wi = twim[(p - 1) * q:p * q]
            if three_d:
                wr = wr.reshape(q, 1, 1)
                wi = wi.reshape(q, 1, 1)
            br, bi = bs_re[p], bs_im[p]
            bs_re[p] = br * wr - bi * wi
            bs_im[p] = br * wi + bi * wr
    if scale0 is not None:  # inverse final stage: fold 1/n into the p=0 term
        bs_re[0] = bs_re[0] * scale0
        bs_im[0] = bs_im[0] * scale0
        if tw is None:  # twiddle-free final stage: scale every term
            for p in range(1, r):
                bs_re[p] = bs_re[p] * scale0
                bs_im[p] = bs_im[p] * scale0
    xs_re, xs_im = _small_dft(bs_re, bs_im, inverse)
    g = n // (r * l)
    if three_d:
        s, w = cre.shape[-2], cre.shape[-1]
        return (_interleave3(xs_re, g, l, s, w), _interleave3(xs_im, g, l, s, w))
    b = cre.shape[-1]
    return (_interleave(xs_re, g, l, b), _interleave(xs_im, g, l, b))


def run_stages(cre, cim, n, inverse, offsets, stages, twre, twim,
               fold_scale: bool = True):
    """Run the full Stockham stage chain on [n, b] plane values.

    twre/twim: packed per-stage twiddle column values ([total, 1]).
    fold_scale: fold 1/n into the final stage for the inverse (native
    normalized inverse; set False when the caller folds scaling elsewhere).
    Arithmetic follows the value dtype (f32 tier / bf16 compute tier)."""
    inv_scale = jnp.asarray(1.0 / n, cre.dtype)
    for idx, (r, l) in enumerate(stages):
        is_final = idx == len(stages) - 1
        tw = None
        if offsets[idx] >= 0:
            o = offsets[idx]
            rows = (r - 1) * (n // r)
            tw = (twre[o:o + rows], twim[o:o + rows])
        scale0 = inv_scale if (inverse and is_final and fold_scale) else None
        cre, cim = _stage(cre, cim, n, r, l, tw, inverse, scale0)
    return cre, cim


def _kernel(n, inverse, offsets, stages, use3d, bf16c,
            xre_ref, xim_ref, twre_ref, twim_ref, ore_ref, oim_ref):
    # bf16 INTEROP tier (round-2 Exp 26): planes may be bfloat16 in HBM;
    # butterflies run in f32 so only the I/O rounding costs accuracy
    # (~4e-3). Measured on chip: the in-kernel convert/retile costs roughly
    # what the halved HBM traffic saves (0.8-1.1x the f32 tier).
    # bf16 COMPUTE tier (round-3 headroom d, bf16c=True): butterflies stay
    # bfloat16 end-to-end (bf16 twiddle pack, weak-typed codelet scalars),
    # halving VMEM/register traffic for every stage at ~1e-2 accuracy.
    if bf16c:
        cre = xre_ref[:]
        cim = xim_ref[:]
    else:
        cre = xre_ref[:].astype(jnp.float32)
        cim = xim_ref[:].astype(jnp.float32)
    if use3d:
        # small-n mode (Exp 10): lift lanes into a full (8, w) tiled minor
        # pair so single-row part slices never pad sublanes 8x. Costs one
        # VMEM relayout in and out.
        w = cre.shape[-1] // 8
        cre = cre.reshape(n, 8, w)
        cim = cim.reshape(n, 8, w)
    cre, cim = run_stages(cre, cim, n, inverse, offsets, stages,
                          twre_ref[:], twim_ref[:])
    if use3d:
        cre = cre.reshape(n, -1)
        cim = cim.reshape(n, -1)
    ore_ref[:] = cre.astype(ore_ref.dtype)
    oim_ref[:] = cim.astype(oim_ref.dtype)


def _kernel_postmul(n, inverse, offsets, stages, use3d,
                    xre_ref, xim_ref, twre_ref, twim_ref,
                    pmre_ref, pmim_ref, ore_ref, oim_ref):
    """Stockham stages + elementwise complex post-multiply fused into the
    store epilogue (the four-step twiddle of ops/large.py — Exp 14: the
    separate XLA multiply pass cost ~40us/dir at 2^20)."""
    cre = xre_ref[:]
    cim = xim_ref[:]
    if use3d:
        w = cre.shape[-1] // 8
        cre = cre.reshape(n, 8, w)
        cim = cim.reshape(n, 8, w)
    cre, cim = run_stages(cre, cim, n, inverse, offsets, stages,
                          twre_ref[:], twim_ref[:])
    if use3d:
        cre = cre.reshape(n, -1)
        cim = cim.reshape(n, -1)
    pre = pmre_ref[:]
    pim = pmim_ref[:]
    ore_ref[:] = cre * pre - cim * pim
    oim_ref[:] = cre * pim + cim * pre


@functools.partial(jax.jit, static_argnames=("n", "inverse", "tile_b", "interpret"))
def _stockham_call_postmul(xre, xim, twre, twim, pmre, pmim, n, inverse,
                           tile_b, interpret=False):
    b = xre.shape[-1]
    stages = tuple(stage_plan(n))
    offsets = make_twiddle_pack(n, inverse)[2]
    use3d = n <= config.USE3D_MAX_N and tile_b >= 1024 and tile_b % 8 == 0
    kernel = functools.partial(_kernel_postmul, n, inverse, offsets, stages,
                               use3d)
    grid = (b // tile_b,)
    block = pl.BlockSpec((n, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, b), xre.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block, block, twspec, twspec, block, block],
        out_specs=[block, block],
        out_shape=[out_shape, out_shape],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(xre, xim, twre, twim, pmre, pmim)


def stockham_fft_nb_postmul(xre, xim, pmre, pmim, inverse: bool = False):
    """Batched FFT followed by an elementwise complex multiply with
    (pmre, pmim) [n, batch], fused into the kernel's store."""
    n, b = xre.shape[-2], xre.shape[-1]
    if b % 128 != 0:
        raise ValueError(f"batch (last axis) must be a multiple of 128, got {b}")
    twre, twim = _TwCache.get(n, inverse)
    tile_b = _pick_tile(n, b)
    if b % tile_b != 0:
        tile_b = 128
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    return _stockham_call_postmul(xre, xim, twre, twim, pmre, pmim, n,
                                  inverse, tile_b, interpret=interpret)


def _kernel_dma3d(n, inverse, offsets, stages,
                  xre_ref, xim_ref, twre_ref, twim_ref, ore_ref, oim_ref):
    """3D-block variant (Exp 28): the block arrives as [n, 8, w] straight
    from the DMA (host view [n, 8, b/8]), so the small-n mode's VMEM
    relayout pass disappears entirely."""
    cre = xre_ref[:].astype(jnp.float32)
    cim = xim_ref[:].astype(jnp.float32)
    cre, cim = run_stages(cre, cim, n, inverse, offsets, stages,
                          twre_ref[:], twim_ref[:])
    ore_ref[:] = cre.astype(ore_ref.dtype)
    oim_ref[:] = cim.astype(oim_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n", "inverse", "w_tile",
                                             "interpret"))
def _stockham_call_dma3d(xre, xim, twre, twim, n, inverse, w_tile,
                         interpret=False):
    # xre: [n, 8, W] (host view of [n, b], W = b/8)
    W = xre.shape[-1]
    stages = tuple(stage_plan(n, three_d=True))
    offsets = make_twiddle_pack(n, inverse, three_d=True)[2]
    kernel = functools.partial(_kernel_dma3d, n, inverse, offsets, stages)
    grid = (W // w_tile,)
    block = pl.BlockSpec((n, 8, w_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, 8, W), xre.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block, block, twspec, twspec],
        out_specs=[block, block],
        out_shape=[out_shape, out_shape],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(xre, xim, twre, twim)


@functools.partial(jax.jit, static_argnames=("n", "inverse", "tile_b",
                                             "interpret", "bf16c"))
def _stockham_call(xre, xim, twre, twim, n, inverse, tile_b, interpret=False,
                   bf16c=False):
    b = xre.shape[-1]
    stages = tuple(stage_plan(n))
    offsets = make_twiddle_pack(n, inverse)[2]
    # bf16 compute never takes the use3d in-VMEM relayout: the [n, tile_b]
    # -> [n, 8, w] sublane-fold of a bfloat16 value violates Mosaic's
    # (16, 128) bf16 tiling and fails to compile ON CHIP (round-4 repro;
    # interpret mode hid it — ADVICE r3 #1). The 2D path compiles and runs
    # at every size.
    use3d = (n <= config.USE3D_MAX_N and tile_b >= 1024 and tile_b % 8 == 0
             and not bf16c)
    if bf16c:
        twre = twre.astype(jnp.bfloat16)
        twim = twim.astype(jnp.bfloat16)
    kernel = functools.partial(_kernel, n, inverse, offsets, stages, use3d,
                               bf16c)
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
        # alias input planes onto output planes: frees their block buffers
        # for pipeline overlap — 112us -> 50us at n=4096 (Exp 11). XLA
        # inserts a defensive copy when the caller's buffers aren't
        # donatable, which is still cheaper than the stalls it removes.
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(xre, xim, twre, twim)


def _kernel_bm(n, inverse, offsets, stages, use3d,
               xre_ref, xim_ref, twre_ref, twim_ref, ore_ref, oim_ref):
    """Batch-major variant (Exp 44, VERDICT r3 Weak #3): the block arrives
    as [tile_b, n] straight from the caller's batch-major array and the
    time-major relayout happens IN VMEM (one ~22 TB/s pass) instead of as
    an XLA transpose (a full HBM roundtrip that fori chains cannot cancel
    across iterations — Exp 30). The public batch-major API pays the
    relayout where it is cheapest."""
    cre = xre_ref[:].astype(jnp.float32).T
    cim = xim_ref[:].astype(jnp.float32).T
    if use3d:
        w = cre.shape[-1] // 8
        cre = cre.reshape(n, 8, w)
        cim = cim.reshape(n, 8, w)
    cre, cim = run_stages(cre, cim, n, inverse, offsets, stages,
                          twre_ref[:], twim_ref[:])
    if use3d:
        cre = cre.reshape(n, -1)
        cim = cim.reshape(n, -1)
    ore_ref[:] = cre.T.astype(ore_ref.dtype)
    oim_ref[:] = cim.T.astype(oim_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n", "inverse", "tile_b",
                                             "interpret"))
def _stockham_call_bm(xre, xim, twre, twim, n, inverse, tile_b,
                      interpret=False):
    b = xre.shape[0]
    stages = tuple(stage_plan(n))
    offsets = make_twiddle_pack(n, inverse)[2]
    use3d = n <= config.USE3D_MAX_N and tile_b >= 1024 and tile_b % 8 == 0
    kernel = functools.partial(_kernel_bm, n, inverse, offsets, stages, use3d)
    grid = (b // tile_b,)
    block = pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n), xre.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block, block, twspec, twspec],
        out_specs=[block, block],
        out_shape=[out_shape, out_shape],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(xre, xim, twre, twim)


def stockham_fft_bm(xre, xim, inverse: bool = False):
    """Batched FFT on BATCH-MAJOR planes [batch, n] (the public API's
    natural layout): same mixed-radix Stockham stages as stockham_fft_nb,
    with the batch-major<->time-major relayout fused into the kernel's VMEM
    load/store instead of paid as XLA HBM transposes (Exp 44). batch must
    be a multiple of 8 and n a power of two; returns planes in [batch, n].
    """
    b, n = xre.shape[-2], xre.shape[-1]
    if b % 8 != 0:
        raise ValueError(f"batch (first axis) must be a multiple of 8, got {b}")
    twre, twim = _TwCache.get(n, inverse)
    tile_b = _pick_tile(n, b)
    if b % tile_b != 0:
        tile_b = 8 * math.gcd(b // 8, tile_b // 8 if tile_b >= 8 else 1)
        tile_b = max(tile_b, 8)
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    return _stockham_call_bm(xre, xim, twre, twim, n, inverse, tile_b,
                             interpret=interpret)


class _TwCache:
    """Caches HOST (numpy) twiddle packs only. Device arrays must not be
    cached: an array created while tracing (e.g. inside a user's jit/fori
    chain) is a tracer, and caching it leaks it across traces. numpy args
    become baked constants under an outer jit, which is what we want."""

    _cache: dict = {}

    @classmethod
    def get(cls, n, inverse, three_d=False):
        key = (n, inverse, three_d)
        if key not in cls._cache:
            re, im, _ = make_twiddle_pack(n, inverse, three_d)
            cls._cache[key] = (re, im)
        return cls._cache[key]


def _pick_tile(n: int, b: int) -> int:
    """Lane-tile choice, from the on-chip sweep (docs/EXPERIMENT_LOG.md
    Exp 3/5): small n wants wide tiles (amortize per-grid-step cost), large
    n is VMEM-bound (peak live set ~17 [n, tb] f32 arrays)."""
    if n <= 16:
        tb = 1024  # 3D mode; r2 probe (7-rep medians): 43us vs 47us @2048
    elif n <= 64:
        tb = 2048  # 3D mode; r2 probe: 37us med vs 56us @1024 at n=64
    elif n <= 256:
        tb = 1024  # 3D mode; r2 probe: n=128 64us @1024 vs 69 @2048;
                   # n=256 72us (Exp 21: 512 prefers 2D)
    elif n <= 512:
        tb = 256
    else:
        tb = 128
    while tb > b and tb > 128:
        tb //= 2
    return tb


def _stockham_impl(xre, xim, inverse: bool):
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    if xre.ndim == 3:
        # NATIVE SUBLANE-FOLDED layout [n, 8, W] (Exp 28): the 3D block
        # specs let the HBM->VMEM DMA perform the lane->sublane
        # redistribution, and chained calls never pay a 2D<->3D boundary
        # relayout (XLA materializes that reshape as a real pass between
        # custom calls — measured ~30us per roundtrip at 2^21 elems).
        # Pure-3D roundtrips: n=16 24.5us, n=64 37us vs 55-68us through
        # the 2D contract. A host [n, b] array reshapes to this for free.
        n, s, w = xre.shape
        if s != 8:
            raise ValueError(
                f"3D planes must be [n, 8, W] (sublane-folded), got {xre.shape}")
        if n > config.DMA3D_MAX_N:
            raise ValueError(
                f"3D planes supported for n <= {config.DMA3D_MAX_N}, got {n}; "
                f"use 2D [n, batch] planes")
        if w % 128 != 0:
            raise ValueError(f"W (last axis) must be a multiple of 128, got {w}")
        # Exp 28 probe: n<=128 prefers w_tile 256 (35.7 vs 37.2us at 128);
        # n=256 prefers 128 (46.5 vs 52.0us)
        w_tile = 256 if (n <= 128 and w % 256 == 0) else 128
        twre, twim = _TwCache.get(n, inverse, three_d=True)
        return _stockham_call_dma3d(xre, xim, twre, twim, n, inverse, w_tile,
                                    interpret=interpret)
    n, b = xre.shape[-2], xre.shape[-1]
    if b % 128 != 0:
        raise ValueError(f"batch (last axis) must be a multiple of 128, got {b}")
    twre, twim = _TwCache.get(n, inverse)
    tile_b = _pick_tile(n, b)
    if b % tile_b != 0:
        tile_b = 128
    bf16c = bool(config.BF16_COMPUTE) and xre.dtype == jnp.bfloat16
    return _stockham_call(xre, xim, twre, twim, n, inverse, tile_b,
                          interpret=interpret, bf16c=bf16c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _stockham_diff(xre, xim, inverse):
    return _stockham_impl(xre, xim, inverse)


def _stockham_diff_fwd(xre, xim, inverse):
    return _stockham_impl(xre, xim, inverse), None


def _stockham_diff_bwd(inverse, _, g):
    # The transform is a linear map whose split-real Jacobian transpose is
    # the CONJUGATE transform: VJP(fft) = n * ifft, VJP(ifft) = fft / n
    # (our inverse is normalized). This makes the Pallas path differentiable
    # — pallas_call has no autodiff rule of its own.
    gre, gim = g
    # n is axis 0 in both plane layouts: 2D [n, batch] and 3D [n, 8, W]
    n = gre.shape[0]
    ore, oim = _stockham_impl(gre, gim, not inverse)
    s = jnp.asarray(1.0 / n if inverse else float(n), ore.dtype)
    return ore * s, oim * s


_stockham_diff.defvjp(_stockham_diff_fwd, _stockham_diff_bwd)


def stockham_fft_nb(xre, xim, inverse: bool = False):
    """Batched FFT on time-major planes: 2D [n, batch] (batch on lanes), or
    the NATIVE SUBLANE-FOLDED 3D layout [n, 8, batch//8] for
    n <= config.DMA3D_MAX_N (default 2048; a free host reshape of the same
    data; chained workloads run ~1.4-2x faster in it because no 2D<->3D
    boundary relayout is ever paid — Exp 28/28c/38). Returns planes in
    the same layout and dtype.

    batch (or W) must be a multiple of 128 (pad at the caller). f32 is the
    accuracy tier; bfloat16 planes are the opt-in interop tier for
    bf16-resident ML pipelines (fused in-kernel conversion replaces the
    caller's two convert passes; butterflies still run in f32, so accuracy
    is I/O-rounding-limited, ~4e-3; standalone speed is ~the f32 tier,
    Exp 26). Differentiable (custom VJP: the conjugate transform).
    """
    return _stockham_diff(xre, xim, bool(inverse))
