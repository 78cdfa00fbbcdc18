"""Real FFT (rfft/irfft) via pack-as-complex + Hermitian post/pre-process.

TPU-native port of the reference's real path (modules/fft_split_native_f32.wat:
rfft_split :1578-1639, $rfft_postprocess_split :1471-1559, irfft_split
:1945-1998, $irfft_preprocess_split :1656-1748):

* forward: pack z[j] = x[2j] + i*x[2j+1], M = N/2 complex FFT, then the
  Hermitian recombination
      X[k] = 0.5(Z[k] + conj(Z[M-k])) - 0.5i * w_N^k * (Z[k] - conj(Z[M-k]))
  producing M+1 bins. In the batched lane layout the deinterleave is a strided
  slice on the last axis and the mirror is a flip — no lane shuffles.
* inverse: conjugate pre-process
      Z[k] = 0.5(X[k] + conj(X[M-k])) + 0.5i * w_N^{-k} * (X[k] - conj(X[M-k]))
  followed by the native normalized inverse M-point FFT (1/M folded into its
  outer DFT matrix by the plan layer — reference folds 0.5/M into the
  pre-process instead, fft_split_native_f32.wat:1673-1675; same pass count),
  then re-interleave Re/Im as even/odd samples.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .fourstep import apply_tables

__all__ = ["rfft_post_twiddles", "rfft_planes", "irfft_planes"]


def rfft_post_twiddles(n: int, inverse: bool, dtype=np.float32):
    """w_N^{±k}: forward k=0..M (M+1 values), inverse k=0..M-1. f64 host math."""
    m = n // 2
    sign = +1.0 if inverse else -1.0
    k = np.arange(m + (0 if inverse else 1))
    ang = sign * 2.0 * np.pi * k / n
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def rfft_planes(x, tables, shape_info, wre, wim):
    """x real [..., n] -> (Xre, Xim) with n//2+1 bins."""
    m = x.shape[-1] // 2
    zre, zim = x[..., 0::2], x[..., 1::2]
    zre, zim = apply_tables(zre, zim, tables, shape_info)
    # A = Z extended with Z[M] = Z[0]; B = Z[(M-k) mod M], k = 0..M.
    are = jnp.concatenate([zre, zre[..., :1]], axis=-1)
    aim = jnp.concatenate([zim, zim[..., :1]], axis=-1)
    bre = jnp.concatenate([zre[..., :1], jnp.flip(zre[..., 1:], axis=-1), zre[..., :1]], axis=-1)
    bim = jnp.concatenate([zim[..., :1], jnp.flip(zim[..., 1:], axis=-1), zim[..., :1]], axis=-1)
    # E = 0.5(A + conj(B)); O = -0.5i(A - conj(B)); X = E + w * O.
    ere = 0.5 * (are + bre)
    eim = 0.5 * (aim - bim)
    dre = are - bre
    dim = aim + bim
    ore = 0.5 * dim
    oim = -0.5 * dre
    xre = ere + wre * ore - wim * oim
    xim = eim + wre * oim + wim * ore
    return xre, xim


def irfft_planes(xre, xim, inv_tables, inv_shape_info, wre, wim):
    """(Xre, Xim) with m+1 bins -> real [..., n=2m]. inv_tables: native
    normalized inverse m-point plan."""
    m = xre.shape[-1] - 1
    # A = X[k], B = conj(X[m-k]), k = 0..m-1.
    are, aim = xre[..., :m], xim[..., :m]
    bre = jnp.concatenate([xre[..., m:m + 1], jnp.flip(xre[..., 1:m], axis=-1)], axis=-1)
    bim = -jnp.concatenate([xim[..., m:m + 1], jnp.flip(xim[..., 1:m], axis=-1)], axis=-1)
    ere = 0.5 * (are + bre)
    eim = 0.5 * (aim + bim)
    dre = are - bre
    dim = aim - bim
    # O = +0.5i * d  ->  Ore = -0.5*dim, Oim = +0.5*dre;  Z = E + w * O
    ore = -0.5 * dim
    oim = 0.5 * dre
    zre = ere + wre * ore - wim * oim
    zim = eim + wre * oim + wim * ore
    zre, zim = apply_tables(zre, zim, inv_tables, inv_shape_info)
    # Interleave: x[2j] = Re z[j], x[2j+1] = Im z[j].
    out = jnp.stack([zre, zim], axis=-1)
    return out.reshape(*out.shape[:-2], 2 * m)
