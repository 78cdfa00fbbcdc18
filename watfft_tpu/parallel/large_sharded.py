"""Mesh-sharded single large FFT: the distributed four-step.

Completes BASELINE config 5's multi-chip axis: one N-point transform
(N = n1 * n2) spread over a device mesh. Sharding rides the four-step's
natural parallelism:

  view x [n2, n1], shard the n1 columns over the mesh
  1. column FFTs (length n2)           — local kernel calls, no comms
  2. twiddle T[k2, j1]                 — local (table sharded with the data)
  3. global transpose                  — ONE tiled all_to_all over ICI
     [n2, n1/D] -> [n2/D, n1], then a local transpose -> [n1, n2/D]
  4. row FFTs (length n1)              — local
  Output D[k1, k2] lands column-sharded in natural order X[k1*n2 + k2].

Local transforms use the Pallas kernel when the per-device batch fills the
128-lane minimum, otherwise the portable four-step surface — so the same
code dry-runs on small virtual meshes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.large import large_split
from ..ops.fourstep import fft_planes
from ..ops.pallas_stockham import stockham_fft_nb

__all__ = ["fft_large_sharded"]


def _local_fft(xre, xim, inverse):
    """FFT down columns of [n, b] local planes; kernel when lanes allow."""
    if xre.shape[-1] % 128 == 0 and jax.default_backend() == "tpu":
        return stockham_fft_nb(xre, xim, inverse=inverse)
    # portable: transform along axis 0 via the batch-major four-step
    yre, yim = fft_planes(xre.T, xim.T, inverse=inverse)
    return yre.T, yim.T


def fft_large_sharded(xre, xim, mesh: Mesh, inverse: bool = False,
                      axis: str = "x"):
    """One N-point FFT sharded over `mesh`. x: flat planes [N] (f32).

    Returns flat planes [N] in natural order, column-sharded internally.
    Requires N = n1*n2 with n1 and n2 divisible by the mesh size.
    """
    n = xre.shape[-1]
    n1, n2 = large_split(n)
    d = mesh.shape[axis]
    if n1 % d or n2 % d:
        raise ValueError(f"factors {n1}x{n2} must divide by mesh size {d}")
    sign = +1.0 if inverse else -1.0
    ang = sign * 2.0 * np.pi * (
        np.outer(np.arange(n2, dtype=np.int64),
                 np.arange(n1, dtype=np.int64)) % n) / n
    twre = jnp.asarray(np.cos(ang).astype(np.float32))
    twim = jnp.asarray(np.sin(ang).astype(np.float32))

    def local(xre, xim, twre, twim):  # [n2, n1/D] shards
        xre, xim = _local_fft(xre, xim, inverse)
        cre = xre * twre - xim * twim
        cim = xre * twim + xim * twre
        # global transpose: cols-sharded -> rows-sharded, then local T
        cre = lax.all_to_all(cre, axis, split_axis=0, concat_axis=1, tiled=True)
        cim = lax.all_to_all(cim, axis, split_axis=0, concat_axis=1, tiled=True)
        cre = cre.T  # [n1, n2/D]
        cim = cim.T
        dre, dim = _local_fft(cre, cim, inverse)
        return dre, dim

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(None, axis), P(None, axis)),
    )
    xre2 = xre.reshape(n2, n1)
    xim2 = xim.reshape(n2, n1)
    dre, dim = fn(xre2, xim2, twre, twim)
    return dre.reshape(n), dim.reshape(n)
