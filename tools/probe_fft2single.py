"""Probe (Exp 52): single-image fft2 (BASELINE config 5, 4096^2) without
boundary transposes.

Current path (b=1 fails _fft2_nb_ok's b%128) is separable: col kernel +
XLA swapaxes + row kernel + swapaxes = ~8 HBM passes per direction where 4
would do. Candidate: a row-pass kernel reading [1, 128, w] blocks of the
free [h/128, 128, w] view and doing the [128, w] <-> [w, 128] transpose IN
VMEM (does Mosaic lower a 2D sublane<->lane transpose? at what cost?).

Variants (4096^2 roundtrip, paired vs jnp.fft.fft2):
  A. current fft2_planes
  B. col kernel (stockham_fft_nb time-major, free views) + new row kernel
  C. row kernel alone vs (swapaxes + kernel + swapaxes) — isolates the win
"""
import sys, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from watfft_tpu import config
from watfft_tpu.bench.harness import paired_chain, enable_compile_cache
from watfft_tpu.ops.pallas_stockham import (stage_plan, make_twiddle_pack,
                                            run_stages, _TwCache,
                                            stockham_fft_nb)
from watfft_tpu.ops.fft2 import fft2_planes

enable_compile_cache()
rng = np.random.default_rng(3)

h = w = 4096


def _row_kernel(w, inverse, offsets, stages,
                xre_ref, xim_ref, twre_ref, twim_ref, ore_ref, oim_ref):
    xre = xre_ref[:][0]                    # [128, w]
    xim = xim_ref[:][0]
    tre = jnp.swapaxes(xre, 0, 1)          # [w, 128] lane<->sublane in VMEM
    tim = jnp.swapaxes(xim, 0, 1)
    tre, tim = run_stages(tre, tim, w, inverse, offsets, stages,
                          twre_ref[:], twim_ref[:])
    ore_ref[:] = jnp.swapaxes(tre, 0, 1)[None]
    oim_ref[:] = jnp.swapaxes(tim, 0, 1)[None]


@functools.partial(jax.jit, static_argnames=("w", "inverse"))
def row_fft_lanes(xre, xim, w, inverse):
    """FFT along the last axis of [h, w] via [h/128, 128, w] blocks with
    in-VMEM transposes (no XLA boundary transpose)."""
    hh = xre.shape[0]
    stages = tuple(stage_plan(w))
    offsets = make_twiddle_pack(w, inverse)[2]
    twre, twim = _TwCache.get(w, inverse)
    v = (hh // 128, 128, w)
    kernel = functools.partial(_row_kernel, w, inverse, offsets, stages)
    blk = pl.BlockSpec((1, 128, w), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    tw = pl.BlockSpec(np.shape(twre), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(v, xre.dtype)
    r, im_ = pl.pallas_call(
        kernel, grid=(hh // 128,),
        in_specs=[blk, blk, tw, tw],
        out_specs=[blk, blk],
        out_shape=[out_shape, out_shape],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
    )(xre.reshape(v), xim.reshape(v), jnp.asarray(twre), jnp.asarray(twim))
    return r.reshape(hh, w), im_.reshape(hh, w)


def col_fft(xre, xim, inverse):
    # time-major FFT along axis 0 of [h, w]: free views, 2 HBM passes
    return stockham_fft_nb(xre, xim, inverse=inverse)


@functools.partial(jax.jit, static_argnames=("inverse",))
def fft2_single(xre, xim, inverse=False):
    xre, xim = col_fft(xre, xim, inverse)
    return row_fft_lanes(xre, xim, xre.shape[1], inverse)


xre = jnp.asarray(rng.uniform(-1, 1, (h, w)).astype(np.float32))
xim = jnp.asarray(rng.uniform(-1, 1, (h, w)).astype(np.float32))

# correctness gate (subsampled f64 oracle on a smaller case first)
hs = ws = 256
a = rng.uniform(-1, 1, (hs, ws)).astype(np.float32)
b = rng.uniform(-1, 1, (hs, ws)).astype(np.float32)


def small_check():
    st = tuple(stage_plan(ws))
    off = make_twiddle_pack(ws, False)[2]
    gre, gim = jax.jit(lambda p, q: row_fft_lanes(p, q, ws, False))(
        jnp.asarray(a), jnp.asarray(b))
    ref = np.fft.fft(a.astype(np.float64) + 1j * b.astype(np.float64), axis=-1)
    got = np.asarray(gre) + 1j * np.asarray(gim)
    return np.max(np.abs(got - ref)) / np.max(np.abs(ref))


print(f"row_fft_lanes rel_err (256^2): {small_check():.2e}", flush=True)

g2 = jax.jit(lambda p, q: fft2_single(p, q, False))(
    jnp.asarray(a), jnp.asarray(b))
ref2 = np.fft.fft2(a.astype(np.float64) + 1j * b.astype(np.float64))
got2 = np.asarray(g2[0]) + 1j * np.asarray(g2[1])
print(f"fft2_single rel_err (256^2): "
      f"{np.max(np.abs(got2 - ref2)) / np.max(np.abs(ref2)):.2e}", flush=True)


def astep(c):
    p, q = c
    p, q = fft2_planes(p, q, inverse=False)
    return fft2_planes(p, q, inverse=True)


def bstep(c):
    p, q = c
    p, q = fft2_single(p, q, False)
    return fft2_single(p, q, True)


def jstep(c):
    p, q = c
    z = jnp.fft.ifft2(jnp.fft.fft2(p + 1j * q))
    return (jnp.real(z), jnp.imag(z))


t_a, t_j, r_a, _ = paired_chain(astep, (xre, xim), jstep, (xre, xim), reps=5)
print(f"A separable: {t_a*1e6:.0f}us vs jnp {t_j*1e6:.0f}us = x{r_a:.2f}",
      flush=True)
t_b, t_j2, r_b, _ = paired_chain(bstep, (xre, xim), jstep, (xre, xim), reps=5)
print(f"B fused-T  : {t_b*1e6:.0f}us vs jnp {t_j2*1e6:.0f}us = x{r_b:.2f}  "
      f"(B/A = {t_a/t_b:.2f}x)", flush=True)

# C: isolate the row pass
def c1(c):
    p, q = c
    return row_fft_lanes(p, q, w, False)

def c2(c):
    p, q = c
    p = jnp.swapaxes(p, 0, 1)
    q = jnp.swapaxes(q, 0, 1)
    p, q = stockham_fft_nb(p, q, inverse=False)
    return jnp.swapaxes(p, 0, 1), jnp.swapaxes(q, 0, 1)

t_c1, t_c2, r_c, _ = paired_chain(c1, (xre, xim), c2, (xre, xim), reps=5)
print(f"C row-pass: in-VMEM-T {t_c1*1e6:.0f}us vs swapaxes-path "
      f"{t_c2*1e6:.0f}us = x{r_c:.2f}", flush=True)
