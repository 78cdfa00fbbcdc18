"""Mesh-sharded REAL-input faces: distributed rfft-large, 2D real FFT,
and the batch-sharded STFT workload step (VERDICT r3 #6 — the real-path
analogs of fft_large_sharded / fft2_sharded / the BASELINE config-4 STFT).

All faces follow the package's split-plane convention and compose the same
local kernels the single-chip paths use, so they dry-run on virtual CPU
meshes and differentiate (every local piece has a VJP).

ICI traffic model (docs/ICI_MODEL.md has the derivations):
  rfft_large_sharded   1 tiled all_to_all of the m=N/2 core (2*4*m/D bytes
                       per device per direction) + the Hermitian flip
                       (XLA-inserted collective-permute, 2*4*m/D bytes)
  rfft2_sharded        1 tiled all_to_all of the W/2 packed columns
                       (2*4*H*W/2/D bytes) + 1 all_gather of the Nyquist
                       column (4*H bytes — negligible) each way
  stft_sharded         ZERO collectives (pure DP over the batch axis)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from .sharded import _local_fft, _local_rfft, _local_irfft, _swap_sharded_axis
from .large_sharded import fft_large_sharded

__all__ = ["rfft_large_sharded", "irfft_large_sharded",
           "rfft2_sharded", "irfft2_sharded", "stft_sharded"]


def rfft_large_sharded(x, mesh: Mesh, axis: str = "x"):
    """One huge real N-point forward FFT over the mesh: pack-as-complex
    m = N/2 core on the distributed four-step (fft_large_sharded — column
    FFTs local, ONE tiled all_to_all over ICI, row FFTs local), Hermitian
    recombination on the sharded result (the flip's cross-shard reads
    lower to XLA collective-permutes; ~one core-plane pass of ICI traffic).

    x: real flat [N] (f32), N = 2m with m = n1*n2 and n1, n2 divisible by
    the mesh size. Returns spectrum planes ([m+1], [m+1]).
    """
    from ..ops.pallas_rfft import hermitian_post_nb
    n = x.shape[-1]
    m = n // 2
    xv = x.reshape(m, 2)
    zre, zim = fft_large_sharded(xv[:, 0], xv[:, 1], mesh, inverse=False,
                                 axis=axis)
    re, im = hermitian_post_nb(zre.reshape(m, 1), zim.reshape(m, 1), n)
    return re[:, 0], im[:, 0]


def irfft_large_sharded(re, im, mesh: Mesh, axis: str = "x"):
    """Inverse of rfft_large_sharded: [m+1] spectrum planes -> real [2m]
    (normalized — the 0.5 fold lives in hermitian_pre_nb, the 1/m in the
    distributed four-step's native inverse)."""
    from ..ops.pallas_rfft import hermitian_pre_nb
    m1 = re.shape[-1]
    m = m1 - 1
    n = 2 * m
    zre, zim = hermitian_pre_nb(re.reshape(m1, 1), im.reshape(m1, 1), n)
    yre, yim = fft_large_sharded(zre[:, 0], zim[:, 0], mesh, inverse=True,
                                 axis=axis)
    return jnp.stack([yre, yim], axis=-1).reshape(n)


def _col_fft(re, im, inverse):
    """Complex FFT along axis -2 (the row axis) of local planes."""
    re = jnp.swapaxes(re, -1, -2)
    im = jnp.swapaxes(im, -1, -2)
    re, im = _local_fft(re, im, inverse)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def _nyq_rows(z, axis: str, d: int):
    """This device's row shard of a redundantly-computed full-H column."""
    i = lax.axis_index(axis)
    rows = z.shape[-2] // d
    return lax.dynamic_slice_in_dim(z, i * rows, rows, axis=z.ndim - 2)


def rfft2_sharded(x, mesh: Mesh, axis: str = "x"):
    """2D real-input FFT over trailing [H, W], H sharded over the mesh.

    Row rffts are local (packed m = W/2 core + Hermitian post). The column
    pass exchanges only the W/2 non-Nyquist spectrum columns through ONE
    tiled all_to_all (divisible: W/2 % D == 0); the single Nyquist column
    is all_gathered ([H] floats x2 — negligible) and its length-H FFT is
    computed redundantly on every device, avoiding a second all_to_all
    that W/2+1's odd width cannot tile. Returns planes [..., H, W//2+1].

    Requires H % D == 0 and (W//2) % D == 0.
    """
    d = mesh.shape[axis]

    def local(x):  # [..., H/D, W] real
        nd = x.ndim
        re, im = _local_rfft(x)              # [..., H/D, M]
        mre, mim = re[..., :-1], im[..., :-1]
        mre = _swap_sharded_axis(mre, axis)  # [..., H, W/2 / D]
        mim = _swap_sharded_axis(mim, axis)
        mre, mim = _col_fft(mre, mim, False)
        mre = _swap_sharded_axis(mre, axis, reverse=True)
        mim = _swap_sharded_axis(mim, axis, reverse=True)
        nre = lax.all_gather(re[..., -1:], axis, axis=nd - 2, tiled=True)
        nim = lax.all_gather(im[..., -1:], axis, axis=nd - 2, tiled=True)
        nre, nim = _col_fft(nre, nim, False)
        nre = _nyq_rows(nre, axis, d)
        nim = _nyq_rows(nim, axis, d)
        return (jnp.concatenate([mre, nre], axis=-1),
                jnp.concatenate([mim, nim], axis=-1))

    lead = [None] * (jnp.ndim(x) - 2)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(*lead, axis, None),),
                   out_specs=(P(*lead, axis, None), P(*lead, axis, None)))
    return fn(x)


def irfft2_sharded(re, im, mesh: Mesh, axis: str = "x"):
    """Inverse of rfft2_sharded: [..., H, W//2+1] spectrum planes (H
    sharded) -> real [..., H, W]. Same collective pattern, reversed:
    column iffts first (main columns through the all_to_all pair, Nyquist
    column all_gathered + redundant), then local Hermitian-pre + packed
    row inverse."""
    d = mesh.shape[axis]

    def local(re, im):  # [..., H/D, M]
        nd = re.ndim
        mre, mim = re[..., :-1], im[..., :-1]
        mre = _swap_sharded_axis(mre, axis)
        mim = _swap_sharded_axis(mim, axis)
        mre, mim = _col_fft(mre, mim, True)
        mre = _swap_sharded_axis(mre, axis, reverse=True)
        mim = _swap_sharded_axis(mim, axis, reverse=True)
        nre = lax.all_gather(re[..., -1:], axis, axis=nd - 2, tiled=True)
        nim = lax.all_gather(im[..., -1:], axis, axis=nd - 2, tiled=True)
        nre, nim = _col_fft(nre, nim, True)
        nre = _nyq_rows(nre, axis, d)
        nim = _nyq_rows(nim, axis, d)
        return _local_irfft(jnp.concatenate([mre, nre], axis=-1),
                            jnp.concatenate([mim, nim], axis=-1))

    lead = [None] * (jnp.ndim(re) - 2)
    spec = P(*lead, axis, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec), out_specs=spec)
    return fn(re, im)


def stft_sharded(x, mesh: Mesh, n_fft: int = 1024, hop: int = 256,
                 window: str = "hann", axis: str = "x"):
    """Batch-sharded STFT workload step (BASELINE config 4's multi-chip
    face): x [B, T] real with B sharded over the mesh; each device runs the
    single-chip STFT pipeline (frame -> window -> packed rfft) on its batch
    shard. ZERO collectives — pure data parallelism; returns spectrogram
    planes [B, num_frames, n_fft//2+1] x 2, same sharding."""
    from ..stft import stft, _ctx_cache_get

    # Pre-warm the module-level RFFTContext cache OUTSIDE the shard_map
    # trace: creating it inside would store trace-time values on the cached
    # context (the tracer-leak class CLAUDE.md bans device-array caches for).
    _ctx_cache_get(n_fft)
    fn = shard_map(partial(stft, n_fft=n_fft, hop=hop, window=window),
                   mesh=mesh,
                   in_specs=(P(axis, None),),
                   out_specs=(P(axis, None, None), P(axis, None, None)))
    return fn(x)
