"""Small-N batched FFT as ONE MXU matmul per tile (Pallas kernel).

The reference dispatches per-size codelets at small N (fft_combined.wat:477-481,
fft_real_f32_dual.wat:2433-2459). The TPU analog (SURVEY.md §7 "hard parts"):
at n <= 128 the whole transform is a DFT matmul on the systolic array, which
beats butterfly code outright — no stage permutes, no twiddle broadcasts, one
HBM read + one HBM write per plane, and the MXU does the FLOPs for free
(memory-bound regime).

Complex matmul as one REAL matmul via the real representation

    [Xre]   [ Wre  -Wim ] [xre]
    [Xim] = [ Wim   Wre ] [xim]

i.e. a [2n, 2n] @ [2n, tile_b] dot: a single MXU op with contraction 2n
(n=128 -> a perfectly-shaped 256-contraction matmul). The input planes are
stacked along the sublane axis in-kernel (a VMEM concat, no HBM traffic).

Inverse is native: conjugated W with 1/n folded into the matrix — identical
cost to forward (reference analog: ifft_split conjugated tables,
fft_split_native_f32.wat:2124-2190).

precision=HIGHEST: f32 operands run as multi-pass bf16 on the MXU; at the
contraction lengths used here (<= 256) accuracy is f32-class (validated by
the shared accuracy tiers at MAX_REL 5e-6).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config

__all__ = ["dft_matmul_nb"]


def dft_matrix_real(n: int, inverse: bool) -> np.ndarray:
    """[2n, 2n] f32 real representation of the (scaled, for inverse) DFT
    matrix W[k, j] = exp(-+2i pi k j / n) (/n for the inverse). Host f64
    trig with phases reduced mod n (exact-table discipline, plan.py)."""
    k = np.arange(n, dtype=np.int64).reshape(-1, 1)
    j = np.arange(n, dtype=np.int64).reshape(1, -1)
    sign = +1.0 if inverse else -1.0
    ang = sign * 2.0 * np.pi * ((k * j) % n) / n
    scale = (1.0 / n) if inverse else 1.0
    wre = (scale * np.cos(ang))
    wim = (scale * np.sin(ang))
    top = np.concatenate([wre, -wim], axis=1)
    bot = np.concatenate([wim, wre], axis=1)
    return np.concatenate([top, bot], axis=0).astype(np.float32)


def _kernel(n, xre_ref, xim_ref, w_ref, ore_ref, oim_ref):
    x = jnp.concatenate([xre_ref[:], xim_ref[:]], axis=0)   # [2n, tb] in VMEM
    y = jax.lax.dot_general(
        w_ref[:], x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    ore_ref[:] = y[:n]
    oim_ref[:] = y[n:]


@functools.partial(jax.jit, static_argnames=("n", "tile_b", "interpret"))
def _dft_call(xre, xim, w, n, tile_b, interpret=False):
    b = xre.shape[-1]
    kernel = functools.partial(_kernel, n)
    grid = (b // tile_b,)
    block = pl.BlockSpec((n, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, b), xre.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block, block, wspec],
        out_specs=[block, block],
        out_shape=[out_shape, out_shape],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(xre, xim, w)


class _WCache:
    """Host (numpy) DFT matrices only — cached numpy becomes a baked constant
    under an outer jit; device arrays must never be cached (tracer leak)."""

    _cache: dict = {}

    @classmethod
    def get(cls, n, inverse):
        key = (n, inverse)
        if key not in cls._cache:
            cls._cache[key] = dft_matrix_real(n, inverse)
        return cls._cache[key]


def _pick_tile(n: int, b: int) -> int:
    """Wide lane tiles: the kernel is one matmul, so per-grid-step overhead
    dominates at small n. VMEM live set ~5 [n, tb]-sized f32 buffers
    (x planes + out planes + stacked operand) plus double-buffering."""
    tb = 4096 if n <= 32 else (2048 if n <= 64 else 1024)
    while tb > b and tb > 128:
        tb //= 2
    return tb


def dft_matmul_nb(xre, xim, inverse: bool = False):
    """Batched small-N FFT on time-major planes [n, batch] (batch on lanes).

    batch must be a multiple of 128; n <= config.DIRECT_MAX (power of two).
    Returns planes in the same layout. f32 only.
    """
    n, b = xre.shape[-2], xre.shape[-1]
    if b % 128 != 0:
        raise ValueError(f"batch (last axis) must be a multiple of 128, got {b}")
    w = _WCache.get(n, inverse)
    tile_b = _pick_tile(n, b)
    if b % tile_b != 0:
        tile_b = 128
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    return _dft_call(xre, xim, w, n, tile_b, interpret=interpret)
