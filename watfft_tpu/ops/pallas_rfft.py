"""Real-FFT fast path (time-major [n, batch], batch on lanes).

TPU-native analog of the reference's flagship real path
(modules/fft_split_native_f32.wat: rfft_split :1578-1639, irfft_split
:1945-1998). Structure: HYBRID — the m-point complex core runs as the
Pallas Stockham kernel (all stages VMEM-resident), while the deinterleave
and the Hermitian post/pre-process run as XLA ops around it:

  forward:  strided-slice deinterleave -> pallas core -> Hermitian
            recombination X[k] = E + w_N^k * O  (E = 0.5(A + conj(B)),
            O = -0.5i(A - conj(B)), A = Z ext, B = Z[(M-k) mod M])
  inverse:  conjugate pre-process Z[k] = E' + w_N^{-k} * O' -> native
            normalized inverse core (1/M folded in its final stage) ->
            row re-interleave.

Why hybrid and not one fused kernel: the mirror Z[M-k] needs a sublane
reversal, and Mosaic currently lowers neither `rev` nor strided gathers
inside Pallas TPU kernels (both verified on-chip); XLA lowers rev/concat/
elementwise efficiently and fuses the whole post-process into ~one pass.
A single-pass fused variant (in-kernel reversal via a swap network or
scratch copy loop) is logged as future work in docs/EXPERIMENT_LOG.md.

The extra XLA passes touch [m, b]-sized data (half the c2c size), so the
hybrid still does ~n/2-scale work per pass with zero lane shuffles.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from .pallas_stockham import (
    stockham_fft_nb, run_stages, stage_plan, make_twiddle_pack, _pick_tile,
    _TwCache,
)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rfft_nb", "irfft_nb"]


# -- exact MXU selection dots (Exp 47) ----------------------------------------
# Mosaic lowers the [m, 2, b] parity view as per-row sublane selects; at
# [4096, 512] the select + stack-reinterleave cost 3.53x the ENTIRE m=2048
# core arithmetic (tools/probe_real4096f.py, chained on chip). Running the
# same permutation as blocked 0/1 matmuls on the MXU cuts the roundtrip tax
# to 1.51x. Precision: Mosaic lowers only DEFAULT (1 bf16 pass, inexact for
# f32 data) and HIGHEST (6 passes) in-kernel — but a 0/1 selection dot is
# EXACT in 3 single-pass bf16 dots: the matrix is exact in bf16, the f32
# datum splits exactly into 3 bf16 parts (8+8+8 >= 24 mantissa bits, each
# residual representable), and the one-hot row sums one element's parts in
# the f32 accumulator, where every partial sum is a bit-truncation of the
# original f32 value (non-overlapping mantissa ranges) — so the result is
# bit-identical to the parity select. Measured: 6-pass HIGHEST selection
# 79.0us vs bf16x3 61.8us vs parity 144.0us per [4096, 512] roundtrip.

_SEL_DOT_1P = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.DEFAULT,
)


def _sel_dot(dm, x):
    """Exact selection dot for a 0/1 matrix `dm` (f32) against data rows
    `x` (f32 or bf16). See the Exp 47 block comment above. ONLY safe
    inside a compiled Mosaic kernel: in interpret mode the kernel body is
    XLA ops, and XLA's algebraic simplifier factors the three dots into
    dot(D, xh + xm + xl) with bf16 adds — collapsing the split to a lossy
    single bf16 pass (~1e-3, seen on the axon backend). Interpret-mode
    callers must use _sel_dot_exact instead."""
    if x.dtype == jnp.bfloat16:  # bf16 data is exact in one bf16 pass
        return _SEL_DOT_1P(dm.astype(jnp.bfloat16), x).astype(x.dtype)
    db = dm.astype(jnp.bfloat16)
    xh = x.astype(jnp.bfloat16)
    r1 = x - xh.astype(jnp.float32)
    xm = r1.astype(jnp.bfloat16)
    xl = (r1 - xm.astype(jnp.float32)).astype(jnp.bfloat16)
    return _SEL_DOT_1P(db, xh) + _SEL_DOT_1P(db, xm) + _SEL_DOT_1P(db, xl)


_SEL_DOT_HST = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)


def _sel_dot_exact(dm, x):
    """Interpret-mode selection dot: plain HIGHEST f32 (exact for 0/1
    matrices, and immune to the XLA refactoring that breaks bf16x3
    outside Mosaic)."""
    return _SEL_DOT_HST(dm, x.astype(jnp.float32)).astype(x.dtype)


def _deint_matrix(g: int) -> np.ndarray:
    """[g, g] 0/1: row t (t < g/2) selects input row 2t (even -> re half);
    row g/2 + t selects input row 2t + 1 (odd -> im half)."""
    d = np.zeros((g, g), np.float32)
    h = g // 2
    t = np.arange(h)
    d[t, 2 * t] = 1.0
    d[h + t, 2 * t + 1] = 1.0
    return d


class _DCache:
    """Host (numpy) deinterleave/reinterleave selection matrices
    ([g, g], g = min(128, n)); device arrays must never be cached."""

    _c: dict = {}

    @classmethod
    def get(cls, g: int, transpose: bool = False) -> np.ndarray:
        key = (g, transpose)
        if key not in cls._c:
            d = _deint_matrix(g)
            cls._c[key] = np.ascontiguousarray(d.T) if transpose else d
        return cls._c[key]


def _mxu_deint(x, dm, dot=_sel_dot):
    """[n, b] interleaved rows -> ([m, b] even, [m, b] odd) via one
    selection dot per g-row block (g = dm rows)."""
    n = x.shape[0]
    g = dm.shape[0]
    h = g // 2
    res, ims = [], []
    for p in range(n // g):
        blk = dot(dm, x[p * g:(p + 1) * g])
        res.append(blk[:h])
        ims.append(blk[h:])
    if len(res) == 1:
        return res[0], ims[0]
    return jnp.concatenate(res, axis=0), jnp.concatenate(ims, axis=0)


def _mxu_reint(zre, zim, dmt, dot=_sel_dot):
    """([m, b], [m, b]) -> [n, b] interleaved rows: the transpose of
    _mxu_deint, one dot per output g-row block."""
    m = zre.shape[0]
    g = dmt.shape[0]
    h = g // 2
    parts = []
    for p in range(m // h):
        pair = jnp.concatenate([zre[p * h:(p + 1) * h],
                                zim[p * h:(p + 1) * h]], axis=0)
        parts.append(dot(dmt, pair))
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=0)


# -- partial-fusion core kernels (Exp 13) ------------------------------------
# Forward: deinterleave ([m, 2, b] view or MXU selection dots, per the
# Exp 47 size table) + m-point stages in ONE kernel (saves the separate XLA
# deinterleave pass); inverse: stages + row interleave in one kernel. The
# Hermitian mirror stays in XLA (Exp 8: the in-kernel mirror walk loses to
# XLA's native rev).

def _rfft_core_kernel(n, offsets, stages, use3d, mxu_sel, sdot, *refs):
    if mxu_sel:
        x_ref, twre_ref, twim_ref, dm_ref, zre_ref, zim_ref = refs
    else:
        x_ref, twre_ref, twim_ref, zre_ref, zim_ref = refs
    m = n // 2
    b = x_ref.shape[-1]
    if mxu_sel:
        zre, zim = _mxu_deint(x_ref[:], dm_ref[:], dot=sdot)
    else:
        xv = x_ref[:].reshape(m, 2, b)
        zre = xv[:, 0, :]
        zim = xv[:, 1, :]
    if use3d:
        w = b // 8
        zre = zre.reshape(m, 8, w)
        zim = zim.reshape(m, 8, w)
    zre, zim = run_stages(zre, zim, m, False, offsets, stages,
                          twre_ref[:], twim_ref[:])
    if use3d:
        zre = zre.reshape(m, -1)
        zim = zim.reshape(m, -1)
    zre_ref[:] = zre
    zim_ref[:] = zim


def _irfft_core_kernel(n, offsets, stages, use3d, mxu_sel, sdot, *refs):
    if mxu_sel:
        zre_ref, zim_ref, twre_ref, twim_ref, dmt_ref, o_ref = refs
    else:
        zre_ref, zim_ref, twre_ref, twim_ref, o_ref = refs
    m = n // 2
    b = zre_ref.shape[-1]
    zre = zre_ref[:]
    zim = zim_ref[:]
    if use3d:
        w = b // 8
        zre = zre.reshape(m, 8, w)
        zim = zim.reshape(m, 8, w)
    zre, zim = run_stages(zre, zim, m, True, offsets, stages,
                          twre_ref[:], twim_ref[:])
    if use3d:
        zre = zre.reshape(m, -1)
        zim = zim.reshape(m, -1)
    if mxu_sel:
        o_ref[:] = _mxu_reint(zre, zim, dmt_ref[:], dot=sdot)
    else:
        o_ref[:] = jnp.stack([zre, zim], axis=1).reshape(n, b)


@functools.partial(jax.jit,
                   static_argnames=("n", "tile_b", "interpret", "mxu_sel"))
def _rfft_core_call(x, twre, twim, dm, n, tile_b, interpret=False,
                    mxu_sel=False):
    m = n // 2
    b = x.shape[-1]
    stages = tuple(stage_plan(m))
    offsets = make_twiddle_pack(m, False)[2]
    use3d = (m <= config.USE3D_MAX_N and tile_b >= 1024 and tile_b % 8 == 0
             and not mxu_sel)
    sdot = _sel_dot_exact if interpret else _sel_dot
    kernel = functools.partial(_rfft_core_kernel, n, offsets, stages, use3d,
                               mxu_sel, sdot)
    grid = (b // tile_b,)
    xblock = pl.BlockSpec((n, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    zblock = pl.BlockSpec((m, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    zshape = jax.ShapeDtypeStruct((m, b), x.dtype)
    in_specs = [xblock, twspec, twspec]
    operands = [x, twre, twim]
    if mxu_sel:
        in_specs.append(pl.BlockSpec(dm.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(dm)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[zblock, zblock],
        out_shape=[zshape, zshape],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit,
                   static_argnames=("n", "tile_b", "interpret", "mxu_sel"))
def _irfft_core_call(zre, zim, twre, twim, dmt, n, tile_b, interpret=False,
                     mxu_sel=False):
    m = n // 2
    b = zre.shape[-1]
    stages = tuple(stage_plan(m))
    offsets = make_twiddle_pack(m, True)[2]
    use3d = (m <= config.USE3D_MAX_N and tile_b >= 1024 and tile_b % 8 == 0
             and not mxu_sel)
    sdot = _sel_dot_exact if interpret else _sel_dot
    kernel = functools.partial(_irfft_core_kernel, n, offsets, stages, use3d,
                               mxu_sel, sdot)
    grid = (b // tile_b,)
    zblock = pl.BlockSpec((m, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    oblock = pl.BlockSpec((n, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [zblock, zblock, twspec, twspec]
    operands = [zre, zim, twre, twim]
    if mxu_sel:
        in_specs.append(pl.BlockSpec(dmt.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(dmt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=oblock,
        out_shape=jax.ShapeDtypeStruct((n, b), zre.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*operands)


def _rfft_core_kernel_dma3d(n, offsets, stages,
                            x_ref, twre_ref, twim_ref, zre_ref, zim_ref):
    """3D-block variant (round-3, Exp 37 — the real-path port of Exp 28):
    the block arrives as [n, 8, w] straight from the DMA, the deinterleave
    is a free leading-dim split [m, 2, 8, w], and the small-n mode's VMEM
    relayout pass disappears entirely."""
    m = n // 2
    x = x_ref[:]
    s, w = x.shape[-2], x.shape[-1]
    xv = x.reshape(m, 2, s, w)
    zre, zim = run_stages(xv[:, 0], xv[:, 1], m, False, offsets, stages,
                          twre_ref[:], twim_ref[:])
    zre_ref[:] = zre
    zim_ref[:] = zim


def _irfft_core_kernel_dma3d(n, offsets, stages,
                             zre_ref, zim_ref, twre_ref, twim_ref, o_ref):
    m = n // 2
    zre, zim = run_stages(zre_ref[:], zim_ref[:], m, True, offsets, stages,
                          twre_ref[:], twim_ref[:])
    s, w = zre.shape[-2], zre.shape[-1]
    o_ref[:] = jnp.stack([zre, zim], axis=1).reshape(n, s, w)


@functools.partial(jax.jit, static_argnames=("n", "w_tile", "interpret"))
def _rfft_core_call_dma3d(x, twre, twim, n, w_tile, interpret=False):
    m = n // 2
    W = x.shape[-1]
    stages = tuple(stage_plan(m, three_d=True))
    offsets = make_twiddle_pack(m, False, three_d=True)[2]
    kernel = functools.partial(_rfft_core_kernel_dma3d, n, offsets, stages)
    grid = (W // w_tile,)
    xblock = pl.BlockSpec((n, 8, w_tile), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    zblock = pl.BlockSpec((m, 8, w_tile), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    zshape = jax.ShapeDtypeStruct((m, 8, W), x.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[xblock, twspec, twspec],
        out_specs=[zblock, zblock],
        out_shape=[zshape, zshape],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, twre, twim)


@functools.partial(jax.jit, static_argnames=("n", "w_tile", "interpret"))
def _irfft_core_call_dma3d(zre, zim, twre, twim, n, w_tile, interpret=False):
    m = n // 2
    W = zre.shape[-1]
    stages = tuple(stage_plan(m, three_d=True))
    offsets = make_twiddle_pack(m, True, three_d=True)[2]
    kernel = functools.partial(_irfft_core_kernel_dma3d, n, offsets, stages)
    grid = (W // w_tile,)
    zblock = pl.BlockSpec((m, 8, w_tile), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    oblock = pl.BlockSpec((n, 8, w_tile), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[zblock, zblock, twspec, twspec],
        out_specs=oblock,
        out_shape=jax.ShapeDtypeStruct((n, 8, W), zre.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(zre, zim, twre, twim)


class _Cache:
    """Host-side (numpy) post-twiddle cache — device arrays must not be
    cached (a tracer-created array cached across traces leaks)."""

    _c: dict = {}

    @classmethod
    def get(cls, n, inverse):
        key = (n, inverse)
        if key not in cls._c:
            m = n // 2
            sign = +1.0 if inverse else -1.0
            k = np.arange(m + (0 if inverse else 1))
            ang = sign * 2.0 * np.pi * k / n
            cls._c[key] = (np.cos(ang).astype(np.float32).reshape(-1, 1),
                           np.sin(ang).astype(np.float32).reshape(-1, 1))
        return cls._c[key]


def rfft_nb(x):
    """Real forward FFT on time-major [n, batch] -> planes [n//2+1, batch].
    batch must be a multiple of 128; f32 only. Differentiable (custom VJP:
    the adjoint reuses the inverse kernel — see _rfft_nb_bwd)."""
    return _rfft_diff(x)


def hermitian_post_nb(zre, zim, n):
    """Hermitian recombination on time-major [m, b] core planes -> [m+1, b]
    spectrum planes, lean form: one flip, one 3-part concat.
    Core rows k = 1..m-1 use A = Z[k], B = Z[m-k]; DC and Nyquist come
    from Z[0] alone: X[0] = Re(Z0)+Im(Z0), X[m] = Re(Z0)-Im(Z0) (real).
    Shared by the hybrid Pallas path and the large-N four-step real path."""
    m = n // 2
    wre, wim = _Cache.get(n, False)
    are, aim = zre[1:], zim[1:]
    bre = jnp.flip(zre[1:], axis=0)
    bim = jnp.flip(zim[1:], axis=0)
    ere = 0.5 * (are + bre)
    eim = 0.5 * (aim - bim)
    dre = are - bre
    dim = aim + bim
    ore = 0.5 * dim
    oim = -0.5 * dre
    wr, wi = wre[1:m], wim[1:m]
    if zre.ndim == 3:  # native [m, 8, W] planes: broadcast over both minors
        wr = wr.reshape(-1, 1, 1)
        wi = wi.reshape(-1, 1, 1)
    xre_core = ere + wr * ore - wi * oim
    xim_core = eim + wr * oim + wi * ore
    z0re, z0im = zre[:1], zim[:1]
    xre = jnp.concatenate([z0re + z0im, xre_core, z0re - z0im], axis=0)
    zero = jnp.zeros_like(z0re)
    xim = jnp.concatenate([zero, xim_core, zero], axis=0)
    return xre, xim


def _rfft_impl(x):
    if x.ndim == 3:
        # NATIVE SUBLANE-FOLDED layout [n, 8, W] (Exp 37; same contract as
        # stockham_fft_nb's 3D mode): the lane->sublane redistribution
        # rides the HBM->VMEM DMA, and the Hermitian post runs directly on
        # 3D planes — no 2D<->3D boundary relayout anywhere.
        n, s, W = x.shape
        m = n // 2
        if s != 8:
            raise ValueError(
                f"3D planes must be [n, 8, W] (sublane-folded), got {x.shape}")
        if m > config.DMA3D_MAX_N:
            raise ValueError(
                f"3D real planes supported for n <= {2 * config.DMA3D_MAX_N}, "
                f"got {n}; use 2D [n, batch] planes")
        if W % 128 != 0:
            raise ValueError(f"W (last axis) must be a multiple of 128, got {W}")
        w_tile = 256 if (m <= 128 and W % 256 == 0) else 128
        sre, sim = _TwCache.get(m, False, three_d=True)
        interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
        zre, zim = _rfft_core_call_dma3d(x, jnp.asarray(sre), jnp.asarray(sim),
                                         n, w_tile, interpret=interpret)
        return hermitian_post_nb(zre, zim, n)
    n, b = x.shape[-2], x.shape[-1]
    if b % 128 != 0:
        raise ValueError(f"batch (last axis) must be a multiple of 128, got {b}")
    m = n // 2
    # fused deinterleave + m-point core: one kernel, one HBM read of x
    sre, sim = _TwCache.get(m, False)
    tile_b = _pick_tile(m, b)
    if b % tile_b != 0:
        tile_b = 128
    mxu_sel = n in config.RFFT_MXU_SELECT_FWD_SIZES
    dm = jnp.asarray(_DCache.get(min(128, n))) if mxu_sel else None
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    zre, zim = _rfft_core_call(x, jnp.asarray(sre), jnp.asarray(sim), dm, n,
                               tile_b, interpret=interpret, mxu_sel=mxu_sel)
    return hermitian_post_nb(zre, zim, n)


# ---------------------------------------------------------------------------
# Fully-fused single-pass variants: the whole rfft pipeline in ONE
# pallas_call. The Hermitian mirror B[k] = Z[(m-k) mod m] is a sublane
# reversal Mosaic cannot lower (no rev/strided gather) — so it runs on the
# MXU instead. Round-2's version used a DENSE [m, m] exchange matrix (one
# matmul replaces the mirror pass, but at m^2*b MACs it lost 2.1x to the
# hybrid at n=1024 — Exp 19). Round 3 exploits the permutation's BLOCK
# structure: with Z split into G-row blocks (G = min(128, m)), output block
# i sources rows t >= 1 from input block B-1-i REVERSED, plus one boundary
# row (t = 0) from the first row of block (B-i) mod B. Reordering blocks is
# a free concat of row slices; the within-block reversal is ONE [G, G]
# constant matmul batched over the B blocks — m*G*b MACs, i.e. m/128 times
# cheaper than dense, and every tile is a full MXU tile (precision HIGHEST;
# 0/1 entries make the product exact). Reference analog:
# $stage_r4_s1_rfft_fused (Experiment 61,
# fft_split_native_f32.wat:2220-2716), which fused the post-process into
# the final stage in registers; an earlier per-8-row dynamic-slice walk
# here measured SLOWER than the hybrid (Exp 8) and was replaced by the
# MXU mirror.
# ---------------------------------------------------------------------------

import functools as _ft

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from .pallas_stockham import run_stages as _run_stages, stage_plan as _stage_plan
from .pallas_stockham import make_twiddle_pack as _mk_pack, _pick_tile as _pick_tile_c


def _mirror_block_matrix(m: int) -> np.ndarray:
    """[G, G] f32 0/1 within-block reversal: J[t, G-t] = 1 for t >= 1
    (row 0 stays zero — the block-boundary rows are patched by concat)."""
    g = min(128, m)
    j = np.zeros((g, g), np.float32)
    t = np.arange(1, g)
    j[t, g - t] = 1.0
    return j


# The mirror matmuls are 0/1 selection dots, so the exact 3-pass bf16x3
# form applies inside compiled kernels (Exp 47); round-3 used HIGHEST
# (6 passes, bit-identical result, strictly more MXU passes). Interpret
# mode keeps HIGHEST (see _sel_dot's docstring).
_MIRROR_DOT = _sel_dot


def _mirror_rows(z, jblk, extra_row0=None, dot=_MIRROR_DOT):
    """M[k] = z[(m - k) mod m] on [m, b] VMEM values via the blocked MXU
    mirror: per output block i, rows t >= 1 come from input block nb-1-i
    through the [G, G] reversal matmul (a clean 2D MXU dot), and the
    boundary row t = 0 is a single-row slice of block (nb-i) mod nb. If
    extra_row0 is given (a [1, b] value), it replaces M[0] (the irfft case,
    where M[0] must read the Nyquist row of the m+1-row spectrum instead of
    wrapping to z[0])."""
    m, b = z.shape
    g = jblk.shape[0]
    nb = m // g
    pieces = []
    for i in range(nb):
        blk = dot(jblk, z[(nb - 1 - i) * g:(nb - i) * g])  # row 0 zero
        if i == 0 and extra_row0 is not None:
            pieces.append(extra_row0)
        else:
            src = ((nb - i) % nb) * g
            pieces.append(z[src:src + 1])
        pieces.append(blk[1:])
    return jnp.concatenate(pieces, axis=0)


def _mirror_rows_many(zs, jblk, extra_row0s=None, dot=_MIRROR_DOT):
    """Lane-concat blocked mirror (Exp 41): mirror SEVERAL [m, b] planes
    with ONE [G, G] @ [G, nplanes*nb*b] matmul. Same MACs as the per-block
    form, 1/(nplanes*nb) the matmul count — the per-block form is
    matmul-latency-bound at the sizes where the fused kernel loses to the
    hybrid (docs/OPTIMIZATION_PLAN.md headroom #2/f). The block reorder and
    the re/im pairing ride the lane axis: cheap concats/slices of aligned
    [G, b] tiles, no relayout of the sublane axis anywhere."""
    m, b = zs[0].shape
    g = jblk.shape[0]
    nb = m // g
    if extra_row0s is None:
        extra_row0s = [None] * len(zs)
    cols = []
    for z in zs:
        for i in range(nb):
            cols.append(z[(nb - 1 - i) * g:(nb - i) * g])
    big = dot(jblk, jnp.concatenate(cols, axis=1))  # rows 0 are zero
    res = []
    for p, z in enumerate(zs):
        pieces = []
        for i in range(nb):
            c = (p * nb + i) * b
            blk = big[:, c:c + b]
            if i == 0 and extra_row0s[p] is not None:
                pieces.append(extra_row0s[p])
            else:
                src = ((nb - i) % nb) * g
                pieces.append(z[src:src + 1])
            pieces.append(blk[1:])
        res.append(jnp.concatenate(pieces, axis=0))
    return res


def _rfft_fused_kernel(n, offsets, stages, lc, mxu_sel, sdot, *refs):
    if mxu_sel:
        (x_ref, twre_ref, twim_ref, wre_ref, wim_ref, jm_ref, dm_ref,
         ore_ref, oim_ref) = refs
    else:
        (x_ref, twre_ref, twim_ref, wre_ref, wim_ref, jm_ref,
         ore_ref, oim_ref) = refs
    m = n // 2
    b = x_ref.shape[-1]
    x = x_ref[:]
    if mxu_sel:
        zre, zim = _mxu_deint(x, dm_ref[:], dot=sdot)
    else:
        # deinterleave via a [m, 2, b] view: strided slices don't lower
        # inside Mosaic (vector.extract_strided_slice requires stride 1)
        xv = x.reshape(m, 2, b)
        zre = xv[:, 0, :]
        zim = xv[:, 1, :]
    zre, zim = _run_stages(zre, zim, m, False, offsets, stages,
                           twre_ref[:], twim_ref[:])
    # B[k] = Z[(m-k) mod m] via the blocked MXU mirror (k = 0 wraps to Z[0],
    # which makes the DC formula below exact: X[0] = Re(Z0) + Im(Z0))
    jm = jm_ref[:]
    if lc:
        bre, bim = _mirror_rows_many([zre, zim], jm, dot=sdot)
    else:
        bre = _mirror_rows(zre, jm, dot=sdot)
        bim = _mirror_rows(zim, jm, dot=sdot)
    ere = 0.5 * (zre + bre)
    eim = 0.5 * (zim - bim)
    ore = 0.5 * (zim + bim)
    oim = -0.5 * (zre - bre)
    wr = wre_ref[0:m]
    wi = wim_ref[0:m]
    ore_ref[0:m, :] = ere + wr * ore - wi * oim
    oim_ref[0:m, :] = eim + wr * oim + wi * ore
    # Nyquist row: X[m] = Re(Z0) - Im(Z0), imag 0
    ore_ref[m:m + 1, :] = zre[0:1] - zim[0:1]
    oim_ref[m:m + 1, :] = jnp.zeros((1, b), x.dtype)


def _irfft_fused_kernel(n, offsets, stages, lc, mxu_sel, sdot, *refs):
    if mxu_sel:
        (xre_ref, xim_ref, twre_ref, twim_ref, wre_ref, wim_ref, jm_ref,
         dmt_ref, o_ref) = refs
    else:
        (xre_ref, xim_ref, twre_ref, twim_ref, wre_ref, wim_ref, jm_ref,
         o_ref) = refs
    m = n // 2
    b = xre_ref.shape[-1]
    are = xre_ref[0:m]
    aim = xim_ref[0:m]
    # B[k] = conj(X[m-k]), k = 0..m-1: the blocked mirror of the core rows,
    # with the k = 0 boundary row reading the Nyquist row m
    jm = jm_ref[:]
    if lc:
        bre, bim = _mirror_rows_many(
            [xre_ref[0:m], xim_ref[0:m]], jm,
            extra_row0s=[xre_ref[m:m + 1], xim_ref[m:m + 1]], dot=sdot)
        bim = -bim
    else:
        bre = _mirror_rows(xre_ref[0:m], jm, extra_row0=xre_ref[m:m + 1],
                           dot=sdot)
        bim = -_mirror_rows(xim_ref[0:m], jm, extra_row0=xim_ref[m:m + 1],
                            dot=sdot)
    ere = 0.5 * (are + bre)
    eim = 0.5 * (aim + bim)
    ore = -0.5 * (aim - bim)
    oim = 0.5 * (are - bre)
    wr = wre_ref[0:m]
    wi = wim_ref[0:m]
    zre = ere + wr * ore - wi * oim
    zim = eim + wr * oim + wi * ore
    zre, zim = _run_stages(zre, zim, m, True, offsets, stages,
                           twre_ref[:], twim_ref[:])
    if mxu_sel:
        o_ref[:] = _mxu_reint(zre, zim, dmt_ref[:], dot=sdot)
    else:
        o_ref[:] = jnp.stack([zre, zim], axis=1).reshape(n, b)


@_ft.partial(jax.jit,
             static_argnames=("n", "tile_b", "interpret", "lc", "mxu_sel"))
def _rfft_fused_call(x, twre, twim, wre, wim, jm, dm, n, tile_b,
                     interpret=False, lc=False, mxu_sel=False):
    m = n // 2
    b = x.shape[-1]
    stages = tuple(_stage_plan(m))
    offsets = _mk_pack(m, False)[2]
    sdot = _sel_dot_exact if interpret else _sel_dot
    kernel = _ft.partial(_rfft_fused_kernel, n, offsets, stages, lc, mxu_sel,
                         sdot)
    grid = (b // tile_b,)
    xblock = pl.BlockSpec((n, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    oblock = pl.BlockSpec((m + 1, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    col = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m + 1, b), x.dtype)
    in_specs = [xblock, col(twre), col(twim), col(wre), col(wim), col(jm)]
    operands = [x, twre, twim, wre, wim, jm]
    if mxu_sel:
        in_specs.append(col(dm))
        operands.append(dm)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[oblock, oblock],
        out_shape=[out_shape, out_shape],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*operands)


@_ft.partial(jax.jit,
             static_argnames=("n", "tile_b", "interpret", "lc", "mxu_sel"))
def _irfft_fused_call(xre, xim, twre, twim, wre, wim, jm, dmt, n, tile_b,
                      interpret=False, lc=False, mxu_sel=False):
    m = n // 2
    b = xre.shape[-1]
    stages = tuple(_stage_plan(m))
    offsets = _mk_pack(m, True)[2]
    sdot = _sel_dot_exact if interpret else _sel_dot
    kernel = _ft.partial(_irfft_fused_kernel, n, offsets, stages, lc, mxu_sel,
                         sdot)
    grid = (b // tile_b,)
    xblock = pl.BlockSpec((m + 1, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    oblock = pl.BlockSpec((n, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    col = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, b), xre.dtype)
    in_specs = [xblock, xblock, col(twre), col(twim), col(wre), col(wim),
                col(jm)]
    operands = [xre, xim, twre, twim, wre, wim, jm]
    if mxu_sel:
        in_specs.append(col(dmt))
        operands.append(dmt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=oblock,
        out_shape=out_shape,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*operands)


class _JCache:
    """Host (numpy) within-block mirror matrices ([G, G], G = min(128, m));
    numpy constants bake under an outer jit (device arrays must never be
    cached — tracer leak)."""

    _c: dict = {}

    @classmethod
    def get(cls, m: int) -> np.ndarray:
        if m not in cls._c:
            cls._c[m] = _mirror_block_matrix(m)
        return cls._c[m]


def rfft_nb_fused(x):
    """Single-pass fused real forward FFT, [n, batch] -> [n//2+1, batch].
    f32, n >= 16, batch % 128 == 0. The Hermitian mirror rides the MXU.
    Differentiable (custom VJP — the same adjoint identities as the hybrid
    path, realized on the fused kernels; see _rfft_fused_diff_bwd)."""
    return _rfft_fused_diff(x)


def _rfft_fused_impl(x):
    if x.ndim != 2:
        raise ValueError(
            f"fused rfft takes 2D [n, batch] planes, got rank {x.ndim}; "
            f"the 3D native layout runs the hybrid path (rfft_nb)")
    n, b = x.shape[-2], x.shape[-1]
    if n < 16:
        raise ValueError("fused rfft requires n >= 16")
    if b % 128 != 0:
        raise ValueError(f"batch must be a multiple of 128, got {b}")
    m = n // 2
    wre, wim = (jnp.asarray(a) for a in _Cache.get(n, False))
    sre, sim = (jnp.asarray(a) for a in
                (_mk_pack(m, False)[0], _mk_pack(m, False)[1]))
    jm = jnp.asarray(_JCache.get(m))
    tile_b = _pick_tile_c(n, b)
    if b % tile_b != 0:
        tile_b = 128
    mxu_sel = n in config.RFFT_MXU_SELECT_FWD_SIZES
    dm = jnp.asarray(_DCache.get(min(128, n))) if mxu_sel else None
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    return _rfft_fused_call(x, sre, sim, wre, wim, jm, dm, n, tile_b,
                            interpret=interpret,
                            lc=n in config.RFFT_MIRROR_LC_SIZES,
                            mxu_sel=mxu_sel)


def irfft_nb_fused(xre, xim):
    """Single-pass fused inverse real FFT, [m+1, batch] -> [2m, batch].
    Differentiable (custom VJP; see _irfft_fused_diff_bwd)."""
    return _irfft_fused_diff(xre, xim)


def _irfft_fused_impl(xre, xim):
    if xre.ndim != 2:
        raise ValueError(
            f"fused irfft takes 2D [m+1, batch] planes, got rank {xre.ndim}; "
            f"the 3D native layout runs the hybrid path (irfft_nb)")
    m1, b = xre.shape[-2], xre.shape[-1]
    m = m1 - 1
    n = 2 * m
    if n < 16:
        raise ValueError("fused irfft requires n >= 16")
    if b % 128 != 0:
        raise ValueError(f"batch must be a multiple of 128, got {b}")
    wre, wim = (jnp.asarray(a) for a in _Cache.get(n, True))
    pk = _mk_pack(m, True)
    sre, sim = jnp.asarray(pk[0]), jnp.asarray(pk[1])
    jm = jnp.asarray(_JCache.get(m))
    tile_b = _pick_tile_c(n, b)
    if b % tile_b != 0:
        tile_b = 128
    mxu_sel = n in config.RFFT_MXU_SELECT_INV_SIZES
    dmt = (jnp.asarray(_DCache.get(min(128, n), transpose=True))
           if mxu_sel else None)
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    return _irfft_fused_call(xre, xim, sre, sim, wre, wim, jm, dmt, n, tile_b,
                             interpret=interpret,
                             lc=n in config.RFFT_MIRROR_LC_SIZES,
                             mxu_sel=mxu_sel)


def irfft_nb(xre, xim):
    """Inverse real FFT: planes [m+1, batch] -> real [2m, batch] (normalized).
    batch must be a multiple of 128; f32 only. Differentiable (custom VJP:
    the adjoint reuses the forward kernel — see _irfft_nb_bwd)."""
    return _irfft_diff(xre, xim)


def hermitian_pre_nb(xre, xim, n):
    """Inverse pre-process on time-major [m+1, b] spectrum planes -> [m, b]
    core planes (to be fed to a normalized m-point inverse FFT). Shared by
    the hybrid Pallas path and the large-N four-step real path."""
    m = n // 2
    wre, wim = _Cache.get(n, True)
    # A = X[0:m]; B = conj(X[m-k]) for k = 0..m-1
    are, aim = xre[:m], xim[:m]
    bre = jnp.concatenate([xre[m:m + 1], jnp.flip(xre[1:m], axis=0)], axis=0)
    bim = -jnp.concatenate([xim[m:m + 1], jnp.flip(xim[1:m], axis=0)], axis=0)
    ere = 0.5 * (are + bre)
    eim = 0.5 * (aim + bim)
    dre = are - bre
    dim = aim - bim
    ore = -0.5 * dim
    oim = 0.5 * dre
    if are.ndim == 3:  # native [m+1, 8, W] planes
        wre = wre.reshape(-1, 1, 1)
        wim = wim.reshape(-1, 1, 1)
    zre = ere + wre * ore - wim * oim
    zim = eim + wre * oim + wim * ore
    return zre, zim


def _irfft_impl(xre, xim):
    if xre.ndim == 3:
        m1, s, W = xre.shape
        m = m1 - 1
        n = 2 * m
        if s != 8:
            raise ValueError(
                f"3D planes must be [m+1, 8, W] (sublane-folded), got {xre.shape}")
        if m > config.DMA3D_MAX_N:
            raise ValueError(
                f"3D real planes supported for n <= {2 * config.DMA3D_MAX_N}, "
                f"got {n}; use 2D planes")
        if W % 128 != 0:
            raise ValueError(f"W (last axis) must be a multiple of 128, got {W}")
        zre, zim = hermitian_pre_nb(xre, xim, n)
        sre, sim = _TwCache.get(m, True, three_d=True)
        w_tile = 256 if (m <= 128 and W % 256 == 0) else 128
        interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
        return _irfft_core_call_dma3d(zre, zim, jnp.asarray(sre),
                                      jnp.asarray(sim), n, w_tile,
                                      interpret=interpret)
    m1, b = xre.shape[-2], xre.shape[-1]
    m = m1 - 1
    n = 2 * m
    if b % 128 != 0:
        raise ValueError(f"batch (last axis) must be a multiple of 128, got {b}")
    zre, zim = hermitian_pre_nb(xre, xim, n)
    # fused inverse core + row interleave: one kernel, one HBM write of x
    sre, sim = _TwCache.get(m, True)
    tile_b = _pick_tile(m, b)
    if b % tile_b != 0:
        tile_b = 128
    mxu_sel = n in config.RFFT_MXU_SELECT_INV_SIZES
    dmt = (jnp.asarray(_DCache.get(min(128, n), transpose=True))
           if mxu_sel else None)
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    return _irfft_core_call(zre, zim, jnp.asarray(sre), jnp.asarray(sim), dmt,
                            n, tile_b, interpret=interpret, mxu_sel=mxu_sel)


# -- autodiff: custom VJPs reusing the kernels themselves ---------------------
# The transforms are linear; pallas_call has no autodiff rule, so each gets
# a custom VJP whose adjoint is derived from the actual composed map
# (deinterleave -> F_m core -> Hermitian post, with DC/Nyquist imag stored
# as literal zeros). Writing the post as X[k] = a_k Z[k] + b_k conj(Z[m-k])
# (a_k = (1 - iW_k)/2, b_k = (1 + iW_k)/2, W_k = e^{-i pi k / m}) and using
# realrep-transpose identities (c v -> conj(c) vbar; c conj(v) is its own
# transpose), the adjoints collapse back onto the kernels:
#
#   VJP(rfft)(g)  = m * irfft(g')   g' = g with REAL end rows doubled and
#                                   IMAG end rows zeroed (the primal's imag
#                                   ends are constants, not functions of x)
#   VJP(irfft)(y) = (1/m) * rfft(y) with end rows corrected: real ends
#                                   halved; imag ends = -+ rfft(y).re[m]/2
#                                   (irfft READS the imag end rows, so their
#                                   cotangents are nonzero — unlike jnp's)
#
# Verified against jacobian-transpose of the XLA-composed map in
# tests/test_autodiff.py.


def _ends_mask(m: int, re0: float, rem: float, core: float = 1.0,
               ndim: int = 2):
    shape = (m + 1,) + (1,) * (ndim - 1)
    s = np.full(shape, core, np.float32)
    s[0] = re0
    s[m] = rem
    return jnp.asarray(s)


@jax.custom_vjp
def _rfft_diff(x):
    return _rfft_impl(x)


def _rfft_diff_fwd(x):
    # n is axis 0 in both plane layouts: 2D [n, batch] and 3D [n, 8, W]
    return _rfft_impl(x), x.shape[0]


def _rfft_diff_bwd(n, g):
    gre, gim = g
    m = n // 2
    gre = gre * _ends_mask(m, 2.0, 2.0, ndim=gre.ndim)
    gim = gim * _ends_mask(m, 0.0, 0.0, ndim=gim.ndim)
    return (jnp.float32(m) * _irfft_impl(gre, gim),)


_rfft_diff.defvjp(_rfft_diff_fwd, _rfft_diff_bwd)


@jax.custom_vjp
def _irfft_diff(xre, xim):
    return _irfft_impl(xre, xim)


def _irfft_diff_fwd(xre, xim):
    return _irfft_impl(xre, xim), xre.shape[0] - 1


def _irfft_diff_bwd(m, ybar):
    gre, gim = _rfft_impl(ybar)   # unnormalized F_m-based forward
    # end-row corrections from the exact adjoint (Z0re = (r0+rm)/2,
    # Z0im = (r0-rm)/2 recovered from the forward's own DC/Nyquist rows):
    # Xbar[0] = conj(c_p[0]) Zbar[0] -> (r0/2, -rm/2);
    # Xbar[m] = c_m[0] conj(Zbar[0]) -> (rm/2, -r0/2).
    r0 = gre[0:1]
    rm = gre[m:m + 1]
    gre = gre * _ends_mask(m, 0.5, 0.5, ndim=gre.ndim)
    gim = jnp.concatenate([-0.5 * rm, gim[1:m], -0.5 * r0], axis=0)
    s = jnp.float32(1.0 / m)
    return gre * s, gim * s


_irfft_diff.defvjp(_irfft_diff_fwd, _irfft_diff_bwd)


# The fused kernels realize the SAME linear maps as the hybrid path (same
# DC wrap-row convention, literal-zero imag ends on the forward, Nyquist
# rows read by the inverse), so the adjoint identities above apply verbatim
# — only the impls differ.


@jax.custom_vjp
def _rfft_fused_diff(x):
    return _rfft_fused_impl(x)


def _rfft_fused_diff_fwd(x):
    return _rfft_fused_impl(x), x.shape[-2]


def _rfft_fused_diff_bwd(n, g):
    gre, gim = g
    m = n // 2
    gre = gre * _ends_mask(m, 2.0, 2.0)
    gim = gim * _ends_mask(m, 0.0, 0.0)
    return (jnp.float32(m) * _irfft_fused_impl(gre, gim),)


_rfft_fused_diff.defvjp(_rfft_fused_diff_fwd, _rfft_fused_diff_bwd)


@jax.custom_vjp
def _irfft_fused_diff(xre, xim):
    return _irfft_fused_impl(xre, xim)


def _irfft_fused_diff_fwd(xre, xim):
    return _irfft_fused_impl(xre, xim), xre.shape[-2] - 1


def _irfft_fused_diff_bwd(m, ybar):
    gre, gim = _rfft_fused_impl(ybar)
    r0 = gre[0:1]
    rm = gre[m:m + 1]
    gre = gre * _ends_mask(m, 0.5, 0.5, ndim=gre.ndim)
    gim = jnp.concatenate([-0.5 * rm, gim[1:m], -0.5 * r0], axis=0)
    s = jnp.float32(1.0 / m)
    return gre * s, gim * s


_irfft_fused_diff.defvjp(_irfft_fused_diff_fwd, _irfft_fused_diff_bwd)
