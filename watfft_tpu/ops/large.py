"""Large-N FFT (N = 2^13 .. 2^20+) via the four-step decomposition.

New scope beyond the reference, whose max size is bounded by its WASM linear
memory layout (8192/16384 points — SURVEY.md §5 long-context note;
docs/MEMORY.md:139-153). The TPU analog tiles the transform through VMEM:

  N = n1 * n2, x[j1 + n1*j2]
  1. view planes [N] -> [n2, n1]: column j1 IS the stride-n1 subsequence in
     time-major layout -> ONE batched Stockham kernel call (n=n2, batch=n1),
     no transpose needed.
  2. twiddle B[k2, j1] *= w_N^{j1*k2} (elementwise, XLA-fused with step 3's
     transpose).
  3. transpose [n2, n1] -> [n1, n2] (the single unavoidable relayout).
  4. second batched kernel call (n=n1, batch=n2) -> D[k1, k2]; the flat
     result is already in natural order X[k1*n2 + k2].

Inverse: conjugate twiddles, inverse kernels; 1/N = (1/n1)*(1/n2) comes for
free from the two native normalized inverse kernels.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from .pallas_stockham import (stockham_fft_nb, stockham_fft_nb_postmul,
                              stage_plan, make_twiddle_pack, run_stages,
                              _TwCache as _StageTwCache)

__all__ = ["fft_large", "fft_large_nb", "large_split",
           "rfft_large_nb", "irfft_large_nb"]


def large_split(n: int) -> tuple[int, int]:
    """Balanced power-of-two split with n1 >= 128 (the outer factor's lane
    minimum) and each factor <= 4096 (kernel max). Odd log2 puts the SMALLER
    factor outer (n1 <= n2): measured at n=32768, (128, 256) beats
    (256, 128) 390.8us vs 405.8us (round-3 valley probe)."""
    log = n.bit_length() - 1
    l1 = min(max(log // 2, 7, log - 12), 12)
    n1 = 1 << l1
    return n1, n // n1


class _TwCache:
    _c: dict = {}

    @classmethod
    def get(cls, n, n1, n2, inverse):
        key = (n, n1, inverse)
        if key not in cls._c:
            sign = +1.0 if inverse else -1.0
            # T[k2, j1] = w_N^{j1*k2} matching the [n2, n1] layout of step 1's
            # output (rows k2, cols j1). f64 host math. numpy-only cache —
            # device arrays created under a trace must not be cached.
            ang = sign * 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n
            cls._c[key] = (np.cos(ang).astype(np.float32),
                           np.sin(ang).astype(np.float32))
        return cls._c[key]


@functools.partial(jax.jit, static_argnames=("n1", "n2", "inverse"))
def _fft_large(xre, xim, twre, twim, n1, n2, inverse):
    # step 1+2: inner FFTs down the columns with the four-step twiddle
    # fused into the kernel's store epilogue (Exp 14: the standalone XLA
    # multiply pass cost ~40us/dir at 2^20)
    xre = xre.reshape(n2, n1)
    xim = xim.reshape(n2, n1)
    cre, cim = stockham_fft_nb_postmul(xre, xim, twre, twim, inverse=inverse)
    # step 3: the one unavoidable transpose (pure relayout, XLA)
    cre = cre.T
    cim = cim.T
    # step 4: outer FFTs -> D[k1, k2]; flat order is the natural output
    dre, dim = stockham_fft_nb(cre, cim, inverse=inverse)
    return dre.reshape(-1), dim.reshape(-1)


class _TwCacheTiled:
    """Host cache of the four-step twiddle repeated across a small in-column
    batch: [n2, n1] -> [n2, n1*b] with each column repeated b times.

    Bounded to the most recent key (ADVICE r2): a tiled pack at n=2^20,
    b=64 is two ~256MB arrays, so an unbounded dict would pin every shape
    ever used. The sub-128-batch path that needs this is rare (the fused
    path's b % 128 == 0 covers the bench/API shapes), so a 1-entry cache
    keeps the steady-state case fast without the permanent footprint."""

    _key = None
    _val = None

    @classmethod
    def get(cls, n, n1, n2, b, inverse):
        key = (n, n1, b, inverse)
        if key != cls._key:
            twre, twim = _TwCache.get(n, n1, n2, inverse)
            cls._val = (np.repeat(twre, b, axis=1),
                        np.repeat(twim, b, axis=1))
            cls._key = key
        return cls._val


@functools.partial(jax.jit, static_argnames=("n1", "n2", "inverse"))
def _fft_large_nb(xre, xim, twre, twim, n1, n2, inverse):
    # Batched four-step on TIME-MAJOR planes [n, b] (the kernel-native
    # layout). With rows j = j1 + n1*j2, the [n2, n1*b] view's columns are
    # (j1, s) with j1 major, so step 1+2 (inner FFTs over j2 + the
    # four-step twiddle) is ONE kernel call with no input transpose. The
    # twiddle T[k2, j1] is host-pre-tiled across the in-column batch
    # ([n2, n1*b]): an in-kernel column broadcast would need a lane-split
    # [n, k, rep] view, which Mosaic only lowers for rep % 128 == 0 AND
    # pm blocks >= 128 lanes — verified unlowerable on chip for practical
    # tiles. The tiled multiplier costs one extra plane-read on this kernel
    # only (~+17% pipeline traffic), still cheaper than a separate XLA
    # multiply pass (Exp 14).
    b = xre.shape[-1]
    xre = xre.reshape(n2, n1 * b)
    xim = xim.reshape(n2, n1 * b)
    cre, cim = stockham_fft_nb_postmul(xre, xim, twre, twim, inverse=inverse)
    # step 3: the one relayout — bring j1 to the row axis, keeping the
    # transform batch innermost: [n2, n1, b] -> [n1, n2, b]
    cre = jnp.swapaxes(cre.reshape(n2, n1, b), 0, 1).reshape(n1, n2 * b)
    cim = jnp.swapaxes(cim.reshape(n2, n1, b), 0, 1).reshape(n1, n2 * b)
    # step 4: outer FFTs over j1 -> D[k1, (k2, s)]; the flat [n, b] view is
    # already the natural output order X[k1*n2 + k2, s]
    dre, dim = stockham_fft_nb(cre, cim, inverse=inverse)
    return dre.reshape(n1 * n2, b), dim.reshape(n1 * n2, b)


def _stage1_kernel(n2, inverse, offsets, stages,
                   xre_ref, xim_ref, twre_ref, twim_ref, ore_ref, oim_ref):
    """First four-step stage on NATIVE 3D blocks [n2, tbj, tbs] of the free
    [n2, n1, b] view (round-3 Exp 30): the FFT runs over axis 0 with the
    (tbj, tbs) minor pair fully tiled, so there is no in-kernel relayout and
    no 2D boundary reshape — the 2D [n, b] -> [n2, n1*b] view the old path
    used changes the minor-two dims and costs a REAL relayout pass per
    plane per direction (Exp 28b's lesson, rediscovered here)."""
    cre, cim = run_stages(xre_ref[:], xim_ref[:], n2, inverse, offsets,
                          stages, twre_ref[:], twim_ref[:])
    ore_ref[:] = cre
    oim_ref[:] = cim


@functools.partial(jax.jit, static_argnames=("n2", "inverse", "tbj", "tbs",
                                             "interpret"))
def _stage1_call(xre, xim, twre, twim, n2, inverse, tbj, tbs,
                 interpret=False):
    n1, b = xre.shape[1], xre.shape[2]      # xre: [n2, n1, b]
    stages = tuple(stage_plan(n2))
    offsets = make_twiddle_pack(n2, inverse)[2]
    kernel = functools.partial(_stage1_kernel, n2, inverse, offsets, stages)
    grid = (n1 // tbj, b // tbs)
    blk = pl.BlockSpec((n2, tbj, tbs), lambda i, j: (0, i, j),
                       memory_space=pltpu.VMEM)
    tw = pl.BlockSpec(twre.shape, lambda i, j: (0, 0),
                      memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(xre.shape, xre.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk, blk, tw, tw],
        out_specs=[blk, blk],
        out_shape=[out_shape, out_shape],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(xre, xim, twre, twim)


def _cube_kernel(n1, n2, inverse, off1, st1, off2, st2,
                 xre_ref, xim_ref, pmre_ref, pmim_ref,
                 t1re_ref, t1im_ref, t2re_ref, t2im_ref, ore_ref, oim_ref):
    """The WHOLE four-step in ONE kernel (round-3 Exp 31): when the full
    [n2, n1, 128] cube fits VMEM, the two-kernel pipeline's 8 HBM
    plane-passes collapse to the 4-pass floor (one read + one write per
    plane). Inner n2-point chain over axis 0, four-step twiddle
    ([n2, n1] -> lane broadcast), in-VMEM transpose, outer n1-point chain —
    no intermediate ever touches HBM."""
    cre, cim = run_stages(xre_ref[:], xim_ref[:], n2, inverse, off1, st1,
                          t1re_ref[:], t1im_ref[:])
    pre = pmre_ref[:][:, :, None]          # [n2, n1, 1] -> lane broadcast
    pim = pmim_ref[:][:, :, None]
    tre = cre * pre - cim * pim
    tim = cre * pim + cim * pre
    tre = jnp.swapaxes(tre, 0, 1)          # [n1, n2, L]
    tim = jnp.swapaxes(tim, 0, 1)
    tre, tim = run_stages(tre, tim, n1, inverse, off2, st2,
                          t2re_ref[:], t2im_ref[:])
    ore_ref[:] = tre
    oim_ref[:] = tim


@functools.partial(jax.jit, static_argnames=("n1", "n2", "inverse",
                                             "interpret"))
def _cube_call(xre, xim, pmre, pmim, s1re, s1im, s2re, s2im,
               n1, n2, inverse, interpret=False):
    b = xre.shape[-1]                      # xre: [n2, n1, b]
    st1 = tuple(stage_plan(n2))
    off1 = make_twiddle_pack(n2, inverse)[2]
    st2 = tuple(stage_plan(n1))
    off2 = make_twiddle_pack(n1, inverse)[2]
    kernel = functools.partial(_cube_kernel, n1, n2, inverse, off1, st1,
                               off2, st2)
    grid = (b // 128,)
    inblk = pl.BlockSpec((n2, n1, 128), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    pmspec = pl.BlockSpec(pmre.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    tw1 = pl.BlockSpec(s1re.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    tw2 = pl.BlockSpec(s2re.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((n1, n2, 128), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n1, n2, b), xre.dtype)
    # io-aliasing frees the input block buffers for pipeline overlap
    # (Exp 11) but requires matching abstract shapes: only the symmetric
    # split qualifies ([n2, n1, b] == [n1, n2, b] iff n1 == n2)
    aliases = {0: 0, 1: 1} if n1 == n2 else {}
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[inblk, inblk, pmspec, pmspec, tw1, tw1, tw2, tw2],
        out_specs=[oblk, oblk],
        out_shape=[out_shape, out_shape],
        input_output_aliases=aliases,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(xre, xim, pmre, pmim, s1re, s1im, s2re, s2im)


@functools.partial(jax.jit, static_argnames=("n1", "n2", "inverse",
                                             "interpret"))
def _fft_large_nb_cube(xre, xim, pmre, pmim, s1re, s1im, s2re, s2im,
                       n1, n2, inverse, interpret):
    b = xre.shape[-1]
    x3re = xre.reshape(n2, n1, b)
    x3im = xim.reshape(n2, n1, b)
    dre, dim = _cube_call(x3re, x3im, pmre, pmim, s1re, s1im, s2re, s2im,
                          n1, n2, inverse, interpret)
    return dre.reshape(n1 * n2, b), dim.reshape(n1 * n2, b)


def _stage2_kernel(n1, inverse, offsets, stages,
                   cre_ref, cim_ref, pmre_ref, pmim_ref, twre_ref, twim_ref,
                   ore_ref, oim_ref):
    """Fused second four-step stage (round-2 Exp 27): four-step twiddle
    multiply + the [k2, j1] -> [j1, k2] transpose + the n1-point Stockham
    chain, all in one kernel. The transpose is an in-VMEM swapaxes(0, 1) on
    the 3D block (lane dim untouched — verified lowerable on chip); the
    twiddle block T[k2-tile, n1] has a FULL last dim so it satisfies the
    Mosaic block-shape rule that killed the earlier broadcast design."""
    cre = cre_ref[:]                       # [tbk, n1, tbs]
    cim = cim_ref[:]
    pre = pmre_ref[:][:, :, None]          # [tbk, n1, 1] -> lane broadcast
    pim = pmim_ref[:][:, :, None]
    tre = cre * pre - cim * pim
    tim = cre * pim + cim * pre
    tre = jnp.swapaxes(tre, 0, 1)          # [n1, tbk, tbs]
    tim = jnp.swapaxes(tim, 0, 1)
    tbk, tbs = cre.shape[0], cre.shape[2]
    tre = tre.reshape(n1, tbk * tbs)
    tim = tim.reshape(n1, tbk * tbs)
    tre, tim = run_stages(tre, tim, n1, inverse, offsets, stages,
                          twre_ref[:], twim_ref[:])
    ore_ref[:] = tre.reshape(n1, tbk, tbs)
    oim_ref[:] = tim.reshape(n1, tbk, tbs)


@functools.partial(jax.jit, static_argnames=("n1", "n2", "inverse", "tbk",
                                             "tbs", "interpret"))
def _stage2_call(cre, cim, pmre, pmim, twre, twim, n1, n2, inverse, tbk, tbs,
                 interpret=False):
    b = cre.shape[-1]                      # cre: [n2, n1, b]
    stages = tuple(stage_plan(n1))
    offsets = make_twiddle_pack(n1, inverse)[2]
    kernel = functools.partial(_stage2_kernel, n1, inverse, offsets, stages)
    grid = (n2 // tbk, b // tbs)
    cspec = pl.BlockSpec((tbk, n1, tbs), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    pmspec = pl.BlockSpec((tbk, n1), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((n1, tbk, tbs), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n1, n2, b), cre.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cspec, cspec, pmspec, pmspec, twspec, twspec],
        out_specs=[ospec, ospec],
        out_shape=[out_shape, out_shape],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(cre, cim, pmre, pmim, twre, twim)


@functools.partial(jax.jit, static_argnames=("n1", "n2", "inverse", "tbk",
                                             "tbj", "interpret"))
def _fft_large_nb_fused(xre, xim, pmre, pmim, s1re, s1im, s2re, s2im,
                        n1, n2, inverse, tbk, tbj, interpret):
    # Fully-3D pipeline (round-3 Exp 30). [n, b] -> [n2, n1, b] is a FREE
    # leading-dim split (n1 % 8 == 0 keeps every (8, 128) tile intact), so
    # the only data movement is the two kernels' own HBM passes:
    #   kernel 1: plain Stockham over j2 on native 3D blocks — NO twiddle,
    #   NO pm read (the four-step multiply lives in kernel 2's load)
    #   kernel 2: pm twiddle + in-VMEM transpose + n1-point chain (Exp 27)
    # The old path went through [n2, n1*b] 2D planes: that view and the
    # [n2, n1*b] -> [n2, n1, b] reshape after kernel 1 each cost a real
    # relayout pass per plane per direction (~4 hidden passes — measured
    # 719us at n=32768 vs ~8 true HBM passes worth ~164us).
    b = xre.shape[-1]
    x3re = xre.reshape(n2, n1, b)
    x3im = xim.reshape(n2, n1, b)
    cre, cim = _stage1_call(x3re, x3im, s1re, s1im, n2, inverse, tbj, 128,
                            interpret)
    dre, dim = _stage2_call(cre, cim, pmre, pmim, s2re, s2im, n1, n2,
                            inverse, tbk, 128, interpret)
    return dre.reshape(n1 * n2, b), dim.reshape(n1 * n2, b)


def fft_large_nb(xre, xim, inverse: bool = False, split=None, tbk=None,
                 tbj=None, mode=None):
    """Batched large-N FFT on time-major planes [N, batch] (f32).

    Four-step decomposition with BOTH kernel calls batched over the lane
    axis: the inner call folds (j1, batch) into its batch, the outer call
    folds (k2, batch). One relayout total — identical pass count to the
    single-transform fft_large. N must be a power of two >= 2^13 (the outer
    factor n1 must reach the 128-lane minimum; the inner factor n2 may be
    64, covering N=8192). batch must be a power of two (so twiddle-column
    boundaries align with lane tiles); even batch=1 fills the lanes since
    the fold multiplies it by n1/n2 >= 64.

    split/tbk/tbj/mode override the measured defaults (probes/experiments):
    split = (n1, n2) factor pair, tbk = stage-2 k2-rows per block, tbj =
    stage-1 j1-rows per block, mode = "cube" (single-kernel whole-transform)
    or "pipe2" (two-kernel pipeline).
    """
    n, b = xre.shape[-2], xre.shape[-1]
    n1, n2 = split if split is not None else large_split(n)
    if n1 * n2 != n:
        raise ValueError(f"split {n1}x{n2} != N={n}")
    if n1 < 128 or n2 < 64:
        raise ValueError(
            f"fft_large_nb requires n1 >= 128 (outer lane minimum) and "
            f"n2 >= 64 (got N={n} -> {n1}x{n2}); use the direct kernel")
    if b & (b - 1) and b % 128 != 0:
        raise ValueError(
            f"fft_large_nb batch must be a power of two or a multiple of 128 "
            f"(got {b}); pad the batch axis at the caller")
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    if b % 128 == 0:
        if n > config.LARGE_NB_MAX_N:
            # The fused pipeline cannot compile past 2^20: stage 2's
            # [n1, tbk, 128] output block needs tbk >= 8 (Mosaic sublane
            # divisibility) and tbk=8 at n1 >= 1024 / n2 >= 2048 crashes the
            # TPU compiler (round-3 session-3 probe). Large batches at these
            # sizes belong on the XLA fourstep surface; batches < 128 take
            # the 2D tiled path below.
            raise ValueError(
                f"fft_large_nb: N={n} with batch % 128 == 0 exceeds the "
                f"fused pipeline's ceiling (2^20); use the fourstep surface "
                f"or a batch < 128")
        pmre, pmim = _TwCache.get(n, n1, n2, inverse)
        s1re, s1im = _StageTwCache.get(n2, inverse)
        s2re, s2im = _StageTwCache.get(n1, inverse)
        if mode is None:
            mode = "cube" if n <= config.CUBE_MAX_N else "pipe2"
        if mode == "cube":
            # single-kernel whole-transform (Exp 31): the [n2, n1, 128]
            # cube lives entirely in VMEM, so the four-step runs at the
            # 4-HBM-pass floor (one read + one write per plane)
            return _fft_large_nb_cube(xre, xim, jnp.asarray(pmre),
                                      jnp.asarray(pmim), jnp.asarray(s1re),
                                      jnp.asarray(s1im), jnp.asarray(s2re),
                                      jnp.asarray(s2im), n1, n2, inverse,
                                      interpret)
        # two-kernel pipeline (Exp 27 + 30): native-3D kernel 1, then
        # twiddle + transpose + outer FFT fused into kernel 2 — 8 HBM
        # plane-passes, zero boundary relayouts; for n past the cube's
        # VMEM ceiling
        if tbk is None:
            tbk = 8  # k2-rows per block: 8 * 128 lanes = 1024 merged columns
        tbk = min(tbk, n2)
        if tbj is None:
            tbj = 16  # round-3 sweep: tbk=8/tbj=16 best at 32768 and 65536
        tbj = min(tbj, n1)
        return _fft_large_nb_fused(xre, xim, jnp.asarray(pmre),
                                   jnp.asarray(pmim), jnp.asarray(s1re),
                                   jnp.asarray(s1im), jnp.asarray(s2re),
                                   jnp.asarray(s2im), n1, n2, inverse, tbk,
                                   tbj, interpret)
    twre, twim = _TwCacheTiled.get(n, n1, n2, b, inverse)
    return _fft_large_nb(xre, xim, twre, twim, n1, n2, inverse)


def _rfft_large_impl(x):
    n, b = x.shape[-2], x.shape[-1]
    m = n // 2
    # deinterleave z[j] = x[2j] + i*x[2j+1]: a leading-dim [m, 2, b] view +
    # row selects (XLA relayout passes; the sub-16K Pallas path fuses this
    # into its kernel, but at m >= 2^13 the four-step core dominates)
    xv = x.reshape(m, 2, b)
    zre, zim = fft_large_nb(xv[:, 0, :], xv[:, 1, :])
    from .pallas_rfft import hermitian_post_nb
    return hermitian_post_nb(zre, zim, n)


def _irfft_large_impl(xre, xim):
    m1, b = xre.shape[-2], xre.shape[-1]
    m = m1 - 1
    n = 2 * m
    from .pallas_rfft import hermitian_pre_nb
    zre, zim = hermitian_pre_nb(xre, xim, n)
    # native normalized m-point inverse (1/m folded into the kernels)
    yre, yim = fft_large_nb(zre, zim, inverse=True)
    # re-interleave Re/Im as even/odd samples
    return jnp.stack([yre, yim], axis=1).reshape(n, b)


def rfft_large_nb(x):
    """Large-N real forward FFT on time-major [n, batch] planes (f32):
    pack-as-complex with the m = n/2 core on the batched four-step
    (fft_large_nb), Hermitian recombination in XLA. Domain: n = 2m with m in
    fft_large_nb's range, i.e. n >= 2^14 (and batch constraints per
    fft_large_nb). Extends the real surface past the Stockham kernel's
    ceiling — the reference's real path stops at 16K points
    (fft_real_f32_dual.wat memory layout). Differentiable (custom VJP with
    the same adjoint identities as the Pallas real path)."""
    return _rfft_large_diff(x)


def irfft_large_nb(xre, xim):
    """Large-N inverse real FFT, [m+1, batch] -> [2m, batch] (normalized).
    Differentiable (custom VJP)."""
    return _irfft_large_diff(xre, xim)


# Custom VJPs: same adjoint identities as the hybrid Pallas real path
# (ops/pallas_rfft.py) — the composed maps are identical, only the m-point
# core implementation differs, and the adjoints collapse back onto the
# large-path kernels themselves.


def _large_ends_mask(m: int, re0: float, rem: float):
    s = np.full((m + 1, 1), 1.0, np.float32)
    s[0] = re0
    s[m] = rem
    return jnp.asarray(s)


@jax.custom_vjp
def _rfft_large_diff(x):
    return _rfft_large_impl(x)


def _rfft_large_diff_fwd(x):
    return _rfft_large_impl(x), x.shape[-2]


def _rfft_large_diff_bwd(n, g):
    gre, gim = g
    m = n // 2
    gre = gre * _large_ends_mask(m, 2.0, 2.0)
    gim = gim * _large_ends_mask(m, 0.0, 0.0)
    return (jnp.float32(m) * _irfft_large_impl(gre, gim),)


_rfft_large_diff.defvjp(_rfft_large_diff_fwd, _rfft_large_diff_bwd)


@jax.custom_vjp
def _irfft_large_diff(xre, xim):
    return _irfft_large_impl(xre, xim)


def _irfft_large_diff_fwd(xre, xim):
    return _irfft_large_impl(xre, xim), xre.shape[-2] - 1


def _irfft_large_diff_bwd(m, ybar):
    gre, gim = _rfft_large_impl(ybar)
    r0 = gre[0:1]
    rm = gre[m:m + 1]
    gre = gre * _large_ends_mask(m, 0.5, 0.5)
    gim = jnp.concatenate([-0.5 * rm, gim[1:m], -0.5 * r0], axis=0)
    s = jnp.float32(1.0 / m)
    return gre * s, gim * s


_irfft_large_diff.defvjp(_irfft_large_diff_fwd, _irfft_large_diff_bwd)


def fft_large(xre, xim, inverse: bool = False):
    """FFT of a single large transform on flat planes [N] (f32).

    N must be a power of two with N >= 2^14 (both factors >= 128). For
    batches, vmap/loop at the caller — the transform itself already fills
    the machine.
    """
    n = xre.shape[-1]
    n1, n2 = large_split(n)
    if min(n1, n2) < 128:
        raise ValueError(
            f"fft_large requires N >= 2^14 so both factors reach the 128-lane "
            f"minimum (got N={n} -> {n1}x{n2}); use the direct kernel instead")
    twre, twim = _TwCache.get(n, n1, n2, inverse)
    return _fft_large(xre, xim, twre, twim, n1, n2, inverse)
