"""Single-chip 2D FFT over the trailing [h, w] axes (complex planes).

Structure mirrors ops/large.py's four-step without the twiddle (a 2D FFT is
separable): batched row transforms via the flagship kernel, one transpose,
batched column transforms. For the mesh-sharded multi-chip version see
parallel/sharded.py (the transpose becomes an ICI all_to_all).

Layout: planes [..., h, w]; internally each 1D pass runs time-major with
the other axis (x batch) on lanes. Each pass dispatches per the planner
policy: the Pallas Stockham kernel when its constraints hold (TPU backend,
n <= STOCKHAM_MAX_N, folded lane dim a multiple of 128), else the portable
XLA four-step — so e.g. a bare [64, 64] array works everywhere instead of
dying inside Mosaic (round-1 verdict weak #7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from ..plan import is_power_of_two
from .pallas_stockham import (stockham_fft_nb, stage_plan, make_twiddle_pack,
                              run_stages, _TwCache)
from .large import _stage1_call

__all__ = ["fft2_planes", "fft2_nb", "validate_fft2_shape",
           "rfft2_planes", "irfft2_planes"]


def validate_fft2_shape(shape) -> None:
    """Typed boundary check for the public fft2/ifft2 API: trailing [h, w]
    must be powers of two >= 2 (reference analog: tests/boundary.test.js)."""
    if len(shape) < 2:
        raise ValueError(
            f"fft2 needs at least 2 trailing axes [h, w], got shape {tuple(shape)}")
    h, w = shape[-2], shape[-1]
    for name, n in (("h", h), ("w", w)):
        if not is_power_of_two(int(n)) or n < 2:
            raise ValueError(
                f"fft2 axis {name} must be a power of two >= 2, got {n} "
                f"(shape {tuple(shape)})")


def _kernel_ok(n: int, lanes: int) -> bool:
    from .. import planner
    return (planner.pallas_available() and lanes % 128 == 0
            and 2 <= n <= config.STOCKHAM_MAX_N)


def _fft_rows_timemajor(xre, xim, inverse):
    """FFT along axis -2 of [..., n, b]-shaped planes (n on sublanes)."""
    shape = xre.shape
    n = shape[-2]
    lead = 1
    for s in shape[:-2]:
        lead *= s
    b = shape[-1] * lead
    if not _kernel_ok(n, b):
        # portable XLA path: transform along the last axis batch-major
        from .fourstep import fft_planes
        yre, yim = fft_planes(jnp.swapaxes(xre, -1, -2),
                              jnp.swapaxes(xim, -1, -2), inverse=inverse)
        return jnp.swapaxes(yre, -1, -2), jnp.swapaxes(yim, -1, -2)
    # fold leading batch dims into lanes: [..., n, w] -> [n, lead*w]
    xre2 = jnp.moveaxis(xre.reshape(lead, n, shape[-1]), 0, 1).reshape(n, b)
    xim2 = jnp.moveaxis(xim.reshape(lead, n, shape[-1]), 0, 1).reshape(n, b)
    yre, yim = stockham_fft_nb(xre2, xim2, inverse=inverse)
    yre = jnp.moveaxis(yre.reshape(n, lead, shape[-1]), 1, 0).reshape(shape)
    yim = jnp.moveaxis(yim.reshape(n, lead, shape[-1]), 1, 0).reshape(shape)
    return yre, yim


# -- native-layout fused kernels (round-3 Exp 36) ------------------------------
# The separable XLA pipeline above pays ~4 relayout passes per direction
# (lane folds + the trailing-axes transpose) around its two kernel calls —
# measured 1.49x vs jnp.fft.fft2 at 256^2 (BENCH r3). These kernels reuse
# the four-step machinery (ops/large.py) WITHOUT its twiddle: in the native
# [h, w, B] layout (image batch on lanes) a 2D FFT is stage-1 (h-pass on 3D
# blocks) + a stage-2-style kernel whose [tbh, w] transpose happens IN VMEM
# (a sublane-dim permute; lanes untouched) and which swaps BACK before the
# store so the output keeps [h, w, B] orientation — 4 HBM plane-passes per
# direction, zero boundary relayouts. When the whole [h, w, 128] cube fits
# VMEM (h*w <= CUBE_MAX_N), ONE kernel does both passes at the 2-pass floor.


def _fft2_k2_kernel(w, inverse, offsets, stages,
                    cre_ref, cim_ref, twre_ref, twim_ref, ore_ref, oim_ref):
    cre = cre_ref[:]                       # [tbh, w, tbB]
    cim = cim_ref[:]
    tbh, tbB = cre.shape[0], cre.shape[2]
    tre = jnp.swapaxes(cre, 0, 1).reshape(w, tbh * tbB)
    tim = jnp.swapaxes(cim, 0, 1).reshape(w, tbh * tbB)
    tre, tim = run_stages(tre, tim, w, inverse, offsets, stages,
                          twre_ref[:], twim_ref[:])
    ore_ref[:] = jnp.swapaxes(tre.reshape(w, tbh, tbB), 0, 1)
    oim_ref[:] = jnp.swapaxes(tim.reshape(w, tbh, tbB), 0, 1)


@functools.partial(jax.jit, static_argnames=("w", "inverse", "tbh",
                                             "interpret"))
def _fft2_k2_call(cre, cim, twre, twim, w, inverse, tbh, interpret=False):
    h, b = cre.shape[0], cre.shape[-1]     # cre: [h, w, B]
    stages = tuple(stage_plan(w))
    offsets = make_twiddle_pack(w, inverse)[2]
    kernel = functools.partial(_fft2_k2_kernel, w, inverse, offsets, stages)
    grid = (h // tbh, b // 128)
    blk = pl.BlockSpec((tbh, w, 128), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    tw = pl.BlockSpec(twre.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(cre.shape, cre.dtype)
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
    )(cre, cim, twre, twim)


def _fft2_cube_kernel(h, w, inverse, off1, st1, off2, st2,
                      xre_ref, xim_ref, t1re_ref, t1im_ref,
                      t2re_ref, t2im_ref, ore_ref, oim_ref):
    cre, cim = run_stages(xre_ref[:], xim_ref[:], h, inverse, off1, st1,
                          t1re_ref[:], t1im_ref[:])
    tre = jnp.swapaxes(cre, 0, 1)          # [w, h, L]: lanes untouched
    tim = jnp.swapaxes(cim, 0, 1)
    tre, tim = run_stages(tre, tim, w, inverse, off2, st2,
                          t2re_ref[:], t2im_ref[:])
    ore_ref[:] = jnp.swapaxes(tre, 0, 1)   # restore [h, w, L]
    oim_ref[:] = jnp.swapaxes(tim, 0, 1)


@functools.partial(jax.jit, static_argnames=("h", "w", "inverse",
                                             "interpret"))
def _fft2_cube_call(xre, xim, t1re, t1im, t2re, t2im, h, w, inverse,
                    interpret=False):
    b = xre.shape[-1]
    st1 = tuple(stage_plan(h))
    off1 = make_twiddle_pack(h, inverse)[2]
    st2 = tuple(stage_plan(w))
    off2 = make_twiddle_pack(w, inverse)[2]
    kernel = functools.partial(_fft2_cube_kernel, h, w, inverse, off1, st1,
                               off2, st2)
    grid = (b // 128,)
    blk = pl.BlockSpec((h, w, 128), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM)
    tw1 = pl.BlockSpec(t1re.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    tw2 = pl.BlockSpec(t2re.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(xre.shape, xre.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk, blk, tw1, tw1, tw2, tw2],
        out_specs=[blk, blk],
        out_shape=[out_shape, out_shape],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(xre, xim, t1re, t1im, t2re, t2im)


def _fft2_nb_ok(h: int, w: int, b: int) -> bool:
    from .. import planner
    return (planner.pallas_available()
            and is_power_of_two(h) and is_power_of_two(w)
            and b % 128 == 0
            and 2 <= h <= config.STOCKHAM_MAX_N // 4
            and 2 <= w <= config.STOCKHAM_MAX_N // 4
            and (h * w <= config.CUBE_MAX_N or (h % 8 == 0 and w % 16 == 0)))


def _fft2_nb_impl(xre, xim, inverse: bool):
    h, w, b = xre.shape
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    t1re, t1im = _TwCache.get(h, inverse)
    t2re, t2im = _TwCache.get(w, inverse)
    if h * w <= config.CUBE_MAX_N:
        return _fft2_cube_call(xre, xim, jnp.asarray(t1re), jnp.asarray(t1im),
                               jnp.asarray(t2re), jnp.asarray(t2im),
                               h, w, inverse, interpret)
    cre, cim = _stage1_call(xre, xim, jnp.asarray(t1re), jnp.asarray(t1im),
                            h, inverse, min(16, w), 128, interpret)
    return _fft2_k2_call(cre, cim, jnp.asarray(t2re), jnp.asarray(t2im),
                         w, inverse, min(8, h), interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fft2_nb_diff(xre, xim, inverse):
    return _fft2_nb_impl(xre, xim, inverse)


def _fft2_nb_diff_fwd(xre, xim, inverse):
    return _fft2_nb_impl(xre, xim, inverse), (xre.shape[0], xre.shape[1])


def _fft2_nb_diff_bwd(inverse, hw, g):
    # linear map; adjoint = the conjugate transform (per-axis 1D rule,
    # composed): VJP(fft2) = (h*w) * ifft2, VJP(ifft2) = fft2 / (h*w)
    h, w = hw
    gre, gim = g
    ore, oim = _fft2_nb_impl(gre, gim, not inverse)
    s = jnp.asarray(1.0 / (h * w) if inverse else float(h * w), ore.dtype)
    return ore * s, oim * s


_fft2_nb_diff.defvjp(_fft2_nb_diff_fwd, _fft2_nb_diff_bwd)


def fft2_nb(xre, xim, inverse: bool = False):
    """2D FFT on NATIVE-layout planes [h, w, batch] (image batch on lanes,
    batch % 128 == 0; f32; h, w powers of two). One Pallas kernel when the
    [h, w, 128] cube fits VMEM (h*w <= config.CUBE_MAX_N), else the
    two-kernel pipeline — 2 or 4 HBM plane-passes per direction vs ~8 for
    the separable XLA path. Output keeps [h, w, batch] orientation.
    Differentiable (custom VJP: the conjugate transform)."""
    return _fft2_nb_diff(xre, xim, bool(inverse))


# -- single-image / thin-batch row pass (round-5 Exp 52) -----------------------
# When the image batch cannot fill the 128-lane grid (_fft2_nb_ok fails on
# b % 128 — notably BASELINE config 5's SINGLE 4096^2 image), the separable
# path pays two full-size XLA transposes per direction around the w-axis
# kernel (~8 HBM passes/direction total). This kernel reads [1, 128, w]
# blocks of the FREE [rows/128, 128, w] view and does the [128, w] <->
# [w, 128] lane<->sublane transpose IN VMEM — Mosaic lowers the 2D
# transpose (verified on chip, tools/probe_fft2single.py) — so the w-axis
# pass costs one read + one write. Measured: 4096^2 roundtrip 3255us ->
# 2045us (1.59x), 2.87x -> 4.56x vs jnp.fft.fft2.


def _rowfft_lanes_kernel(w, inverse, offsets, stages,
                         xre_ref, xim_ref, twre_ref, twim_ref,
                         ore_ref, oim_ref):
    tre = jnp.swapaxes(xre_ref[:][0], 0, 1)    # [128, w] -> [w, 128] in VMEM
    tim = jnp.swapaxes(xim_ref[:][0], 0, 1)
    tre, tim = run_stages(tre, tim, w, inverse, offsets, stages,
                          twre_ref[:], twim_ref[:])
    ore_ref[:] = jnp.swapaxes(tre, 0, 1)[None]
    oim_ref[:] = jnp.swapaxes(tim, 0, 1)[None]


@functools.partial(jax.jit, static_argnames=("w", "inverse", "interpret"))
def _rowfft_lanes_call(xre, xim, twre, twim, w, inverse, interpret=False):
    rows = xre.shape[0]                        # xre: [rows, w], rows % 128 == 0
    stages = tuple(stage_plan(w))
    offsets = make_twiddle_pack(w, inverse)[2]
    v = (rows // 128, 128, w)
    kernel = functools.partial(_rowfft_lanes_kernel, w, inverse, offsets,
                               stages)
    blk = pl.BlockSpec((1, 128, w), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    tw = pl.BlockSpec(twre.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(v, xre.dtype)
    ore, oim = pl.pallas_call(
        kernel, grid=(rows // 128,),
        in_specs=[blk, blk, tw, tw],
        out_specs=[blk, blk],
        out_shape=[out_shape, out_shape],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(xre.reshape(v), xim.reshape(v), twre, twim)
    return ore.reshape(rows, w), oim.reshape(rows, w)


def _rowfft_lanes_impl(xre, xim, inverse):
    twre, twim = _TwCache.get(xre.shape[-1], inverse)
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    return _rowfft_lanes_call(xre, xim, jnp.asarray(twre), jnp.asarray(twim),
                              xre.shape[-1], inverse, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rowfft_lanes_diff(xre, xim, inverse):
    return _rowfft_lanes_impl(xre, xim, inverse)


def _rowfft_lanes_diff_fwd(xre, xim, inverse):
    return _rowfft_lanes_impl(xre, xim, inverse), xre.shape[-1]


def _rowfft_lanes_diff_bwd(inverse, w, g):
    # adjoint of the (symmetric) DFT on split planes = the conjugate
    # transform: VJP(fft) = w * ifft, VJP(ifft) = fft / w — the per-axis
    # rule _fft2_nb_diff_bwd uses, one axis
    gre, gim = g
    ore, oim = _rowfft_lanes_impl(gre, gim, not inverse)
    s = jnp.asarray(1.0 / w if inverse else float(w), ore.dtype)
    return ore * s, oim * s


_rowfft_lanes_diff.defvjp(_rowfft_lanes_diff_fwd, _rowfft_lanes_diff_bwd)


def _fft2_thin_ok(h: int, w: int, lead: int) -> bool:
    from .. import planner
    return (planner.pallas_available()
            and is_power_of_two(h) and is_power_of_two(w)
            and (lead * h) % 128 == 0 and (lead * w) % 128 == 0
            and 2 <= h <= config.STOCKHAM_MAX_N
            and 16 <= w <= config.STOCKHAM_MAX_N // 4)


def _fft2_thin(xre, xim, lead, inverse):
    """Separable 2D FFT for thin batches (lead*... not lane-fillable for
    fft2_nb): time-major column pass + the lanes row kernel; rows of all
    images share the 128-row blocks (each row transforms independently)."""
    shape = xre.shape
    h, w = shape[-2], shape[-1]
    xre, xim = _fft_rows_timemajor(xre, xim, inverse)      # columns (h)
    yre, yim = _rowfft_lanes_diff(xre.reshape(lead * h, w),
                                  xim.reshape(lead * h, w), inverse)
    return yre.reshape(shape), yim.reshape(shape)


# -- 2D real FFT (rfft2/irfft2) ------------------------------------------------
# The round-4 bench row composed per-axis 1D pieces (rfft rows + swapaxes +
# complex column FFT, ~10 relayout/kernel passes per roundtrip) and measured
# 1.8x vs jnp.fft.rfft2 — the one row under the 2x BASELINE bar. This path
# instead does the true 2D analog of the reference's pack-as-complex real
# transform (fft_real_f32_dual.wat rfft: pack -> m-point complex core ->
# Hermitian post): pack along w into z[n1,j] = x[n1,2j] + i*x[n1,2j+1],
# ONE half-width fused fft2 (the cube/k2 kernels above), and a single 2D
# Hermitian recombination pass.
#
# Derivation of the 2D recombination: the 1D post-process
#   X_rows[n1,k] = E[n1,k] + W_w^k * O[n1,k],
#   E = (Zr[k] + conj(Zr[(m-k)%m]))/2,  O = -i/2 (Zr[k] - conj(Zr[(m-k)%m]))
# commutes with the (linear) column FFT via
#   fft_col(conj(Y))[k1] = conj(fft_col(Y)[(-k1)%h]),
# so with Zf = fft2(z) the full-2D bins are, for k = 0..m:
#   A[k1,k] = Zf[k1, k%m],  B[k1,k] = conj(Zf[(-k1)%h, (m-k)%m])
#   X[k1,k] = (A+B)/2 + W_w^k * (-i/2)(A-B)
# and the inverse recombination (exact; the 0.5s cancel, no extra scale):
#   Zf[k1,k] = (X + conj(Xm))/2 + i/2 * conj(W_w^k) * (X - conj(Xm)),
#   Xm[k1,k] = X[(-k1)%h, m-k],  k = 0..m-1.
# Same structure as ops/pallas_rfft.hermitian_{post,pre}_nb with one extra
# axis-0 mirror; shares its host twiddle cache (_Cache).


def _axmirror(a, ax):
    """index map k -> (-k) % n along axis ax: [Y0, Y1, ..] -> [Y0, flip(rest)]."""
    ax = ax % a.ndim
    first = jax.lax.slice_in_dim(a, 0, 1, axis=ax)
    rest = jnp.flip(jax.lax.slice_in_dim(a, 1, a.shape[ax], axis=ax), axis=ax)
    return jnp.concatenate([first, rest], axis=ax)


def _herm2_tw(w, inverse, ndim, kax):
    from .pallas_rfft import _Cache
    wre, wim = _Cache.get(w, inverse)
    shape = [1] * ndim
    shape[kax % ndim] = wre.size
    return wre.reshape(shape), wim.reshape(shape)


def herm2_post_nb(zre, zim, w, hax, kax):
    """fft2 of row-packed z [.., h, m, ..] -> rfft2 bins [.., h, m+1, ..]."""
    m = w // 2
    ax = kax % zre.ndim
    a0re = jax.lax.slice_in_dim(zre, 0, 1, axis=ax)
    a0im = jax.lax.slice_in_dim(zim, 0, 1, axis=ax)
    are = jnp.concatenate([zre, a0re], axis=ax)          # A: Zf[k % m]
    aim = jnp.concatenate([zim, a0im], axis=ax)
    core_re = jnp.flip(jax.lax.slice_in_dim(zre, 1, m, axis=ax), axis=ax)
    core_im = jnp.flip(jax.lax.slice_in_dim(zim, 1, m, axis=ax), axis=ax)
    mre = jnp.concatenate([a0re, core_re, a0re], axis=ax)  # Zf[(m-k) % m]
    mim = jnp.concatenate([a0im, core_im, a0im], axis=ax)
    bre = _axmirror(mre, hax)                            # conj + (-k1) % h
    bim = -_axmirror(mim, hax)
    ere = 0.5 * (are + bre)
    eim = 0.5 * (aim + bim)
    dre = are - bre
    dim = aim - bim
    ore = 0.5 * dim
    oim = -0.5 * dre
    wr, wi = _herm2_tw(w, False, zre.ndim, kax)
    return (ere + wr * ore - wi * oim,
            eim + wr * oim + wi * ore)


def herm2_pre_nb(xre, xim, w, hax, kax):
    """Inverse of herm2_post_nb: bins [.., h, m+1, ..] -> packed Zf [.., h, m, ..]."""
    m = w // 2
    ax = kax % xre.ndim
    are = jax.lax.slice_in_dim(xre, 0, m, axis=ax)
    aim = jax.lax.slice_in_dim(xim, 0, m, axis=ax)
    mre = jnp.flip(jax.lax.slice_in_dim(xre, 1, m + 1, axis=ax), axis=ax)
    mim = jnp.flip(jax.lax.slice_in_dim(xim, 1, m + 1, axis=ax), axis=ax)
    bre = _axmirror(mre, hax)
    bim = -_axmirror(mim, hax)
    ere = 0.5 * (are + bre)
    eim = 0.5 * (aim + bim)
    dre = are - bre
    dim = aim - bim
    ore = -0.5 * dim
    oim = 0.5 * dre
    wr, wi = _herm2_tw(w, True, xre.ndim, kax)
    return (ere + wr * ore - wi * oim,
            eim + wr * oim + wi * ore)


def validate_rfft2_shape(shape) -> None:
    validate_fft2_shape(shape)
    if shape[-1] < 4:
        raise ValueError(
            f"rfft2 needs w >= 4 (pack-as-complex m = w/2 >= 2), "
            f"got shape {tuple(shape)}")


@jax.jit
def rfft2_planes(x):
    """2D real FFT of [..., h, w] real input -> spectrum planes
    [..., h, w//2+1] x 2 (numpy.fft.rfft2 semantics over the trailing
    axes). h, w powers of two, w >= 4. One half-width fused fft2 + one
    recombination pass; dispatches like fft2_planes on any backend."""
    validate_rfft2_shape(x.shape)
    w = x.shape[-1]
    zre = x[..., 0::2]
    zim = x[..., 1::2]
    zre, zim = fft2_planes(zre, zim, inverse=False)
    return herm2_post_nb(zre, zim, w, hax=-2, kax=-1)


@jax.jit
def irfft2_planes(re, im):
    """Inverse of rfft2_planes: [..., h, m+1] spectrum planes -> real
    [..., h, 2m] (normalized, numpy.fft.irfft2 semantics)."""
    m1 = re.shape[-1]
    w = 2 * (m1 - 1)
    validate_rfft2_shape(re.shape[:-1] + (w,))
    zre, zim = herm2_pre_nb(re, im, w, hax=-2, kax=-1)
    yre, yim = fft2_planes(zre, zim, inverse=True)
    return jnp.stack([yre, yim], axis=-1).reshape(*yre.shape[:-1], w)


@functools.partial(jax.jit, static_argnames=("inverse",))
def fft2_planes(xre, xim, inverse: bool = False):
    """2D FFT of [..., h, w] split planes (f32). h, w powers of two; any
    shape runs — the native fused kernels (fft2_nb) when their constraints
    hold (the boundary moveaxis passes cancel between chained calls under
    jit), else the separable per-pass dispatch (kernel or XLA four-step)."""
    validate_fft2_shape(xre.shape)
    shape = xre.shape
    h, w = shape[-2], shape[-1]
    lead = 1
    for s in shape[:-2]:
        lead *= s
    if lead and _fft2_nb_ok(h, w, lead):
        x3re = jnp.moveaxis(xre.reshape(lead, h, w), 0, -1)
        x3im = jnp.moveaxis(xim.reshape(lead, h, w), 0, -1)
        ore, oim = fft2_nb(x3re, x3im, inverse=inverse)
        return (jnp.moveaxis(ore, -1, 0).reshape(shape),
                jnp.moveaxis(oim, -1, 0).reshape(shape))
    if lead and _fft2_thin_ok(h, w, lead):
        # thin batch (Exp 52): in-VMEM-transpose row kernel instead of two
        # boundary transposes — 4096^2 single image 2.87x -> 4.56x vs jnp
        return _fft2_thin(xre, xim, lead, inverse)
    # columns: transform along h (axis -2) with w (+batch) on lanes
    xre, xim = _fft_rows_timemajor(xre, xim, inverse)
    # rows: transpose trailing axes, transform along w, transpose back
    xre = jnp.swapaxes(xre, -1, -2)
    xim = jnp.swapaxes(xim, -1, -2)
    xre, xim = _fft_rows_timemajor(xre, xim, inverse)
    xre = jnp.swapaxes(xre, -1, -2)
    xim = jnp.swapaxes(xim, -1, -2)
    return xre, xim
