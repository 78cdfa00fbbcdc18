"""Single-chip 2D FFT over the trailing [h, w] axes (complex planes).

Structure mirrors ops/large.py's four-step without the twiddle (a 2D FFT is
separable): batched row transforms via the flagship kernel, one transpose,
batched column transforms. For the mesh-sharded multi-chip version see
parallel/sharded.py (the transpose becomes an ICI all_to_all).

Layout: planes [..., h, w]; internally each 1D pass runs time-major with
the other axis (x batch) on lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_stockham import stockham_fft_nb

__all__ = ["fft2_planes"]


def _fft_rows_timemajor(xre, xim, inverse):
    """FFT along axis -2 of [..., n, b]-shaped planes (n on sublanes)."""
    shape = xre.shape
    n = shape[-2]
    lead = 1
    for s in shape[:-2]:
        lead *= s
    b = shape[-1] * lead
    # fold leading batch dims into lanes: [..., n, w] -> [n, lead*w]
    xre2 = jnp.moveaxis(xre.reshape(lead, n, shape[-1]), 0, 1).reshape(n, b)
    xim2 = jnp.moveaxis(xim.reshape(lead, n, shape[-1]), 0, 1).reshape(n, b)
    yre, yim = stockham_fft_nb(xre2, xim2, inverse=inverse)
    yre = jnp.moveaxis(yre.reshape(n, lead, shape[-1]), 1, 0).reshape(shape)
    yim = jnp.moveaxis(yim.reshape(n, lead, shape[-1]), 1, 0).reshape(shape)
    return yre, yim


@functools.partial(jax.jit, static_argnames=("inverse",))
def fft2_planes(xre, xim, inverse: bool = False):
    """2D FFT of [..., h, w] split planes (f32). h, w powers of two; w and
    h*prod(batch) must keep the folded lane dims multiples of 128 — in
    practice h, w >= 128 or provide batch dims."""
    # columns: transform along h (axis -2) with w (+batch) on lanes
    xre, xim = _fft_rows_timemajor(xre, xim, inverse)
    # rows: transpose trailing axes, transform along w, transpose back
    xre = jnp.swapaxes(xre, -1, -2)
    xim = jnp.swapaxes(xim, -1, -2)
    xre, xim = _fft_rows_timemajor(xre, xim, inverse)
    xre = jnp.swapaxes(xre, -1, -2)
    xim = jnp.swapaxes(xim, -1, -2)
    return xre, xim
