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

from .pallas_stockham import stockham_fft_nb

__all__ = ["rfft_nb", "irfft_nb"]


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
    batch must be a multiple of 128; f32 only."""
    n, b = x.shape[-2], x.shape[-1]
    if b % 128 != 0:
        raise ValueError(f"batch (last axis) must be a multiple of 128, got {b}")
    m = n // 2
    wre, wim = _Cache.get(n, False)
    # pack z[j] = x[2j] + i*x[2j+1]: strided row slices
    zre = jax.lax.slice(x, (0, 0), (n - 1, b), (2, 1))
    zim = jax.lax.slice(x, (1, 0), (n, b), (2, 1))
    zre, zim = stockham_fft_nb(zre, zim, inverse=False)
    # A = Z ext (Z[M]=Z[0]); B = Z[(M-k) mod M], k = 0..M
    are = jnp.concatenate([zre, zre[:1]], axis=0)
    aim = jnp.concatenate([zim, zim[:1]], axis=0)
    bre = jnp.concatenate([zre[:1], jnp.flip(zre[1:], axis=0), zre[:1]], axis=0)
    bim = jnp.concatenate([zim[:1], jnp.flip(zim[1:], axis=0), zim[:1]], axis=0)
    ere = 0.5 * (are + bre)
    eim = 0.5 * (aim - bim)
    dre = are - bre
    dim = aim + bim
    ore = 0.5 * dim
    oim = -0.5 * dre
    xre = ere + wre * ore - wim * oim
    xim = eim + wre * oim + wim * ore
    return xre, xim


def irfft_nb(xre, xim):
    """Inverse real FFT: planes [m+1, batch] -> real [2m, batch] (normalized).
    batch must be a multiple of 128; f32 only."""
    m1, b = xre.shape[-2], xre.shape[-1]
    m = m1 - 1
    n = 2 * m
    if b % 128 != 0:
        raise ValueError(f"batch (last axis) must be a multiple of 128, got {b}")
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
    zre = ere + wre * ore - wim * oim
    zim = eim + wre * oim + wim * ore
    zre, zim = stockham_fft_nb(zre, zim, inverse=True)
    # interleave: x[2j] = Re z[j], x[2j+1] = Im z[j]
    return jnp.stack([zre, zim], axis=1).reshape(n, b)
