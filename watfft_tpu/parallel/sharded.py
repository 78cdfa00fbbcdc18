"""Multi-chip sharded transforms over a jax.sharding.Mesh.

New capability beyond the reference (which is single-thread WASM with no
distributed layer — SURVEY.md §2.3): the TPU analog of instance-level
concurrency is (a) data-parallel batching over mesh devices and (b) a
mesh-sharded 2D FFT whose transpose step rides ICI all-to-alls inside
shard_map (BASELINE.json config 5).

Layout convention for the 2D transform: planes [H, W] sharded on H (rows).
  1. row FFTs (axis -1) — fully local
  2. all_to_all (tiled) swaps the sharded axis: [H/D, W] -> [H, W/D]
  3. column FFTs over the now-local H axis
  4. all_to_all back to the canonical row-sharded layout
Each FFT call is the same four-step MXU core used on one chip.
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

from .. import config
from ..ops.fourstep import fft_planes
from ..ops.pallas_stockham import stockham_fft_nb

__all__ = ["fft_batch_sharded", "rfft_batch_sharded", "irfft_batch_sharded",
           "fft2_sharded", "make_mesh"]


def _local_fft(xre, xim, inverse):
    """FFT along axis -1 of local shards; the Pallas Stockham kernel when
    the folded batch fills the 128-lane minimum on a TPU backend (same
    conditional as large_sharded._local_fft), else the portable four-step.
    Differentiable either way (the kernel has a custom VJP)."""
    n = xre.shape[-1]
    lead = 1
    for s in xre.shape[:-1]:
        lead *= s
    if (jax.default_backend() == "tpu" and lead % 128 == 0
            and n <= config.STOCKHAM_MAX_N):
        a = xre.reshape(lead, n).T
        b = xim.reshape(lead, n).T
        yre, yim = stockham_fft_nb(a, b, inverse=inverse)
        return yre.T.reshape(xre.shape), yim.T.reshape(xim.shape)
    return fft_planes(xre, xim, inverse=inverse)


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()[: (n_devices or jax.device_count())]
    return Mesh(devs, (axis,))


def fft_batch_sharded(xre, xim, mesh: Mesh, inverse: bool = False, axis: str = "x"):
    """Data-parallel batched FFT: batch axis sharded over the mesh; each
    device runs the single-chip four-step core on its shard (no collectives)."""
    fn = shard_map(
        partial(_local_fft, inverse=inverse),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    return fn(xre, xim)


def _local_rfft(x):
    """Real forward FFT along axis -1 of a local shard [..., n]: pack-as-
    complex m = n/2 core on _local_fft + the shared Hermitian recombination
    (ops/pallas_rfft.hermitian_post_nb — pure jnp, so it shards and
    differentiates transparently)."""
    from ..ops.pallas_rfft import hermitian_post_nb
    n = x.shape[-1]
    m = n // 2
    shape = x.shape
    lead = 1
    for s in shape[:-1]:
        lead *= s
    xv = x.reshape(*shape[:-1], m, 2)
    zre, zim = _local_fft(xv[..., 0], xv[..., 1], inverse=False)
    re, im = hermitian_post_nb(zre.reshape(lead, m).T,
                               zim.reshape(lead, m).T, n)
    return (re.T.reshape(*shape[:-1], m + 1),
            im.T.reshape(*shape[:-1], m + 1))


def _local_irfft(re, im):
    """Inverse of _local_rfft: [..., m+1] spectrum planes -> real [..., 2m]
    (normalized; the 0.5 fold lives in hermitian_pre_nb, the 1/m in the
    native inverse)."""
    from ..ops.pallas_rfft import hermitian_pre_nb
    m1 = re.shape[-1]
    m = m1 - 1
    n = 2 * m
    shape = re.shape
    lead = 1
    for s in shape[:-1]:
        lead *= s
    zre, zim = hermitian_pre_nb(re.reshape(lead, m1).T,
                                im.reshape(lead, m1).T, n)
    zre = zre.T.reshape(*shape[:-1], m)
    zim = zim.T.reshape(*shape[:-1], m)
    yre, yim = _local_fft(zre, zim, inverse=True)
    return jnp.stack([yre, yim], axis=-1).reshape(*shape[:-1], n)


def rfft_batch_sharded(x, mesh: Mesh, axis: str = "x"):
    """Data-parallel batched real FFT: real [B, n] with B sharded over the
    mesh -> spectrum planes [B, n//2+1] x 2, same sharding (no collectives).
    The multi-chip face of BASELINE config 4's STFT workload."""
    fn = shard_map(
        _local_rfft,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(axis, None)),
    )
    return fn(x)


def irfft_batch_sharded(re, im, mesh: Mesh, axis: str = "x"):
    """Inverse of rfft_batch_sharded: [B, m+1] planes -> real [B, 2m]."""
    fn = shard_map(
        _local_irfft,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
    )
    return fn(re, im)


def _swap_sharded_axis(x, axis_name: str, reverse: bool = False):
    """ICI transpose exchange (tiled all-to-all).

    forward: [..., local_rows, full_cols] -> [..., full_rows, local_cols]
    reverse: [..., full_rows, local_cols] -> [..., local_rows, full_cols]
    """
    nd = x.ndim
    if reverse:
        return lax.all_to_all(x, axis_name, split_axis=nd - 2,
                              concat_axis=nd - 1, tiled=True)
    return lax.all_to_all(x, axis_name, split_axis=nd - 1, concat_axis=nd - 2,
                          tiled=True)


def fft2_sharded(xre, xim, mesh: Mesh, inverse: bool = False, axis: str = "x",
                 batch_axis: str | None = None):
    """2D FFT over trailing [H, W] planes, H sharded over the mesh.

    x: [..., H, W] global shape; returns same layout. Batch dims (if any)
    are unsharded by default; on a 2D mesh (the realistic multichip
    topology for BASELINE configs 4+5 combined: data parallelism on one
    axis, transform parallelism on the other) pass `batch_axis` to shard
    the LEADING batch dim over it — the all_to_all then runs per
    batch-group over `axis` only, so transform collectives never cross the
    DP axis.
    """

    def local(xre, xim):  # shapes [..., H/D, W]
        # 1. row FFTs (local, batched over leading dims + local rows)
        xre, xim = _local_fft(xre, xim, inverse)
        # 2. ICI transpose: -> [..., H, W/D]
        xre = _swap_sharded_axis(xre, axis)
        xim = _swap_sharded_axis(xim, axis)
        # 3. column FFTs: bring H to the last axis
        xre = jnp.swapaxes(xre, -1, -2)
        xim = jnp.swapaxes(xim, -1, -2)
        xre, xim = _local_fft(xre, xim, inverse)
        xre = jnp.swapaxes(xre, -1, -2)
        xim = jnp.swapaxes(xim, -1, -2)
        # 4. transpose back to row-sharded canonical layout
        xre = _swap_sharded_axis(xre, axis, reverse=True)
        xim = _swap_sharded_axis(xim, axis, reverse=True)
        return xre, xim

    lead: list = [None] * (jnp.ndim(xre) - 2)
    if batch_axis is not None:
        if not lead:
            raise ValueError("batch_axis requires a leading batch dim")
        lead[0] = batch_axis
    spec = P(*lead, axis, None)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
    )
    return fn(xre, xim)
