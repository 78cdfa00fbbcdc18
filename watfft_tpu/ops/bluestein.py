"""Arbitrary-size FFT via the Bluestein chirp-z transform.

New scope beyond the reference, which is power-of-two only (its in-kernel
dispatch requires pow2, modules/fft_combined.wat:34-38 `$is_power_of_4` /
README.md "power-of-two"): any length n becomes three power-of-two
transforms that ride the existing fast kernels.

Identity: with jk = (j^2 + k^2 - (k - j)^2) / 2,

    X[k] = c_k * sum_j (x_j * c_j) * conj(c_{k-j}),   c_t = e^{-i pi t^2 / n}

i.e. a linear convolution of a_j = x_j c_j with b_t = conj(c_t), evaluated
as a circular convolution of power-of-two length m >= 2n - 1:

    X[k] = c_k * IFFT_m(FFT_m(a) * B)[k],   B = FFT_m(b circularly embedded)

B and the chirp are precomputed on the host in f64 (phases reduced mod 2n —
t^2 mod 2n is exact in int64 far past any practical n), so the device work
is one forward + one inverse m-point pow2 transform plus two elementwise
complex multiplies. The m-point transforms dispatch through the same
decision table as the public complex path (Stockham kernel / batched
four-step / XLA four-step).

The inverse transform uses the conjugated chirp and folds the 1/n into the
final chirp multiply (the m-point inverse's 1/m is native to our kernels).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config

__all__ = ["bluestein_fft_nb", "bluestein_m"]


def bluestein_m(n: int) -> int:
    """Power-of-two circular-convolution length m >= 2n - 1."""
    m = 1
    while m < 2 * n - 1:
        m <<= 1
    return m


class _ChirpCache:
    """Host (numpy, f64) chirp + convolution-kernel spectrum per (n, inverse).
    numpy-only cache — device arrays created under a trace must never be
    cached (tracer leak)."""

    _c: dict = {}

    @classmethod
    def get(cls, n: int, inverse: bool):
        key = (n, inverse)
        if key not in cls._c:
            m = bluestein_m(n)
            t = np.arange(n, dtype=np.int64)
            ph = (t * t) % (2 * n)          # exact phase reduction
            sign = +1.0 if inverse else -1.0
            ang = sign * np.pi * ph.astype(np.float64) / n
            c = np.cos(ang) + 1j * np.sin(ang)          # c_t
            b = np.conj(c)                               # b_t = conj(c_t)
            bc = np.zeros(m, np.complex128)
            bc[:n] = b
            bc[m - n + 1:] = b[1:][::-1]                 # b_{-t} = b_t
            bspec = np.fft.fft(bc)
            as32 = lambda a: np.ascontiguousarray(a, np.float32).reshape(-1, 1)
            cls._c[key] = (m, as32(c.real), as32(c.imag),
                           as32(bspec.real), as32(bspec.imag))
        return cls._c[key]


# -- fused chirp kernels (round-3 Exp 34) -------------------------------------
# XLA cannot fuse elementwise work into a pallas_call, so the naive pipeline
# pays separate HBM passes for the pre-chirp multiply + zero-pad, the
# mid-spectrum multiply, and the final chirp multiply (~2.5 extra full
# m-plane passes — measured 1.56-1.78x vs jnp at n=1000/1009). These two
# kernels fold ALL of that into the two m-point transforms: the forward
# kernel zero-extends n->m and applies the chirp IN VMEM and multiplies by
# the convolution spectrum in its store epilogue; the inverse kernel applies
# the final chirp while storing only the first n rows. Chirp/spectrum ride
# as [rows, 1] VMEM tables exactly like twiddle columns — negligible traffic.


def _bl_fwd_kernel(n, m, offsets, stages,
                   xre_ref, xim_ref, twre_ref, twim_ref,
                   cre_ref, cim_ref, bre_ref, bim_ref, ore_ref, oim_ref):
    from .pallas_stockham import run_stages
    xr = xre_ref[:]
    xi = xim_ref[:]
    cr = cre_ref[:]                      # [n, 1] chirp c_t
    ci = cim_ref[:]
    ar = xr * cr - xi * ci
    ai = xr * ci + xi * cr
    tile = xr.shape[-1]
    z = jnp.zeros((m - n, tile), jnp.float32)
    ar = jnp.concatenate([ar, z], axis=0)
    ai = jnp.concatenate([ai, z], axis=0)
    ar, ai = run_stages(ar, ai, m, False, offsets, stages,
                        twre_ref[:], twim_ref[:])
    br = bre_ref[:]                      # [m, 1] conv-kernel spectrum B
    bi = bim_ref[:]
    ore_ref[:] = ar * br - ai * bi
    oim_ref[:] = ar * bi + ai * br


def _bl_inv_kernel(n, m, offsets, stages,
                   xre_ref, xim_ref, twre_ref, twim_ref,
                   cre_ref, cim_ref, ore_ref, oim_ref):
    from .pallas_stockham import run_stages
    ar = xre_ref[:]
    ai = xim_ref[:]
    # inverse stages fold the native 1/m; the [n, 1] chirp table carries any
    # extra bluestein-inverse 1/n (folded on the host)
    ar, ai = run_stages(ar, ai, m, True, offsets, stages,
                        twre_ref[:], twim_ref[:])
    ar = ar[:n]
    ai = ai[:n]
    cr = cre_ref[:]
    ci = cim_ref[:]
    ore_ref[:] = ar * cr - ai * ci
    oim_ref[:] = ar * ci + ai * cr


@functools.partial(jax.jit, static_argnames=("n", "m", "tile_b", "interpret"))
def _bl_fwd_call(xre, xim, twre, twim, cre, cim, bre, bim, n, m, tile_b,
                 interpret=False):
    from .pallas_stockham import stage_plan, make_twiddle_pack
    b = xre.shape[-1]
    stages = tuple(stage_plan(m))
    offsets = make_twiddle_pack(m, False)[2]
    kernel = functools.partial(_bl_fwd_kernel, n, m, offsets, stages)
    inblock = pl.BlockSpec((n, tile_b), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    outblock = pl.BlockSpec((m, tile_b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m, b), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(b // tile_b,),
        in_specs=[inblock, inblock, row(twre), row(twim),
                  row(cre), row(cim), row(bre), row(bim)],
        out_specs=[outblock, outblock],
        out_shape=[out_shape, out_shape],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(xre, xim, twre, twim, cre, cim, bre, bim)


@functools.partial(jax.jit, static_argnames=("n", "m", "tile_b", "interpret"))
def _bl_inv_call(xre, xim, twre, twim, cre, cim, n, m, tile_b,
                 interpret=False):
    from .pallas_stockham import stage_plan, make_twiddle_pack
    b = xre.shape[-1]
    stages = tuple(stage_plan(m))
    offsets = make_twiddle_pack(m, True)[2]
    kernel = functools.partial(_bl_inv_kernel, n, m, offsets, stages)
    inblock = pl.BlockSpec((m, tile_b), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    outblock = pl.BlockSpec((n, tile_b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, b), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(b // tile_b,),
        in_specs=[inblock, inblock, row(twre), row(twim), row(cre), row(cim)],
        out_specs=[outblock, outblock],
        out_shape=[out_shape, out_shape],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(xre, xim, twre, twim, cre, cim)


def _fused_available(m: int, b: int) -> bool:
    from .. import planner
    return (planner.c2c_kernel(m, "float32") == "stockham"
            and b % 128 == 0)


def _bluestein_fused(xre, xim, n, m, inverse, cre, cim, bre, bim):
    """Both m-point transforms with every chirp multiply fused in-kernel:
    2 HBM roundtrips total (vs ~4.5 plane-passes unfused)."""
    from .pallas_stockham import _TwCache, _pick_tile
    b = xre.shape[-1]
    tile_b = _pick_tile(m, b)
    if b % tile_b != 0:
        tile_b = 128
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    cre_j, cim_j = jnp.asarray(cre), jnp.asarray(cim)
    if inverse:
        # bluestein-inverse: fold the extra 1/n into the FINAL chirp table
        cre_fin, cim_fin = cre_j * (1.0 / n), cim_j * (1.0 / n)
    else:
        cre_fin, cim_fin = cre_j, cim_j
    twf = _TwCache.get(m, False)
    fre, fim = _bl_fwd_call(xre, xim, jnp.asarray(twf[0]), jnp.asarray(twf[1]),
                            cre_j, cim_j, jnp.asarray(bre), jnp.asarray(bim),
                            n, m, tile_b, interpret=interpret)
    twi = _TwCache.get(m, True)
    return _bl_inv_call(fre, fim, jnp.asarray(twi[0]), jnp.asarray(twi[1]),
                        cre_fin, cim_fin, n, m, tile_b, interpret=interpret)


def _fft_m(re, im, inverse: bool):
    """m-point pow2 complex FFT on time-major [m, batch] planes, routed
    through the public decision table (planner.c2c_kernel)."""
    from .. import planner
    k = planner.c2c_kernel(re.shape[-2], "float32")
    if k == "stockham":
        from .pallas_stockham import stockham_fft_nb
        return stockham_fft_nb(re, im, inverse=inverse)
    if k == "large-nb":
        from .large import fft_large_nb
        return fft_large_nb(re, im, inverse=inverse)
    from .fourstep import fft_planes
    r, i = fft_planes(re.T, im.T, inverse=inverse)
    return r.T, i.T


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def bluestein_fft_nb(xre, xim, inverse: bool = False):
    """Complex FFT of ARBITRARY length n on time-major [n, batch] planes
    (f32). Batch is padded to a multiple of 128 internally when the Pallas
    path is taken (pass batch % 128 == 0 to avoid the pad pass). The
    inverse is normalized (1/n). Differentiable (custom VJP: the conjugate
    transform, like the pow2 kernels)."""
    return _bluestein_diff(xre, xim, bool(inverse))


def _bluestein_impl(xre, xim, inverse: bool):
    n, b = xre.shape[-2], xre.shape[-1]
    m, cre, cim, bre, bim = _ChirpCache.get(n, inverse)
    from .. import planner
    pad = 0
    if planner.c2c_kernel(m, "float32") != "fourstep":
        pad = (-b) % 128
    if pad:
        xre = jnp.pad(xre, ((0, 0), (0, pad)))
        xim = jnp.pad(xim, ((0, 0), (0, pad)))
    if _fused_available(m, xre.shape[-1]):
        yre, yim = _bluestein_fused(xre, xim, n, m, inverse,
                                    cre, cim, bre, bim)
    else:
        yre, yim = _bluestein_jit(xre, xim, jnp.asarray(cre),
                                  jnp.asarray(cim), jnp.asarray(bre),
                                  jnp.asarray(bim), n, m, inverse)
    if pad:
        yre, yim = yre[:, :b], yim[:, :b]
    return yre, yim


@functools.partial(jax.jit, static_argnames=("n", "m", "inverse"))
def _bluestein_jit(xre, xim, cre, cim, bre, bim, n, m, inverse):
    bsz = xre.shape[-1]
    # a = x * c, zero-padded to m rows
    are, aim = _cmul(xre, xim, cre, cim)
    are = jnp.concatenate(
        [are, jnp.zeros((m - n, bsz), are.dtype)], axis=0)
    aim = jnp.concatenate(
        [aim, jnp.zeros((m - n, bsz), aim.dtype)], axis=0)
    # circular convolution with the chirp kernel via m-point pow2 FFTs
    fre, fim = _fft_m(are, aim, inverse=False)
    fre, fim = _cmul(fre, fim, bre, bim)
    gre, gim = _fft_m(fre, fim, inverse=True)   # native 1/m normalization
    # final chirp multiply; inverse folds the 1/n here
    yre, yim = _cmul(gre[:n], gim[:n], cre, cim)
    if inverse:
        s = jnp.float32(1.0 / n)
        yre = yre * s
        yim = yim * s
    return yre, yim


# -- autodiff: the transform is linear; adjoint of FFT_n is n * IFFT_n
# (conjugate transpose), exactly as for the pow2 kernels -----------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bluestein_diff(xre, xim, inverse):
    return _bluestein_impl(xre, xim, inverse)


def _bluestein_diff_fwd(xre, xim, inverse):
    return _bluestein_impl(xre, xim, inverse), xre.shape[-2]


def _bluestein_diff_bwd(inverse, n, g):
    # Real-Jacobian transpose of a complex-linear map A is
    # gbar -> conj(A^T conj(gbar)); with the DFT matrix symmetric this
    # collapses to n * IFFT for the forward and (1/n) * FFT for the
    # normalized inverse — the same "adjoint is the conjugate transform"
    # rule the pow2 kernels use.
    gre, gim = g
    if inverse:
        rre, rim = _bluestein_impl(gre, gim, False)
        s = jnp.float32(1.0 / n)
    else:
        rre, rim = _bluestein_impl(gre, gim, True)
        s = jnp.float32(n)
    return rre * s, rim * s


_bluestein_diff.defvjp(_bluestein_diff_fwd, _bluestein_diff_bwd)
