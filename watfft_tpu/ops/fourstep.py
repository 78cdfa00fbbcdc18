"""Batched FFT core: recursive four-step decomposition as MXU matmuls (jnp).

This is the XLA-level implementation of the framework's central design move
(SURVEY.md §7): instead of translating wat-fft's lane-shuffled butterflies
(modules/fft_split_native_f32.wat:748-888), the transform is expressed as DFT
*matmuls* that run on the MXU systolic array, batched over leading axes:

  n <= DIRECT_MAX:  X = x @ W_n                        (one complex matmul)
  n = n1 * n2:      reshape [n] -> [n2, n1], FFT_{n2} along the inner axis
                    (recursive), elementwise twiddle T[j1, k2] = w_N^{j1 k2},
                    outer matmul with W_{n1}, flatten [n1, n2] -> [n].

Complex arithmetic is split-format (separate re/im planes) end to end — the
TPU generalization of the reference's split-plane layout
(fft_split_native_f32.wat:2-5): a complex matmul is 4 real MXU matmuls and a
complex twiddle is 4 VPU FMAs, zero shuffles.

The inverse is *native* (reference analog: ifft_split,
fft_split_native_f32.wat:2124-2190): conjugated tables with 1/n folded into
the outermost DFT matrix by the plan layer — identical pass count to forward.

All matmuls use precision=HIGHEST by default so f32 results are computed
via multi-pass bf16 on the MXU at near-f32 accuracy. Setting
WATFFT_MXU_PRECISION=default drops to single-pass bf16 (~1e-3 rel err) —
the opt-in fast tier for ML workloads (config.MXU_PRECISION, read at trace
time).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..plan import PlanNode, build_tree

__all__ = ["fft_planes", "fft_tables", "apply_tables"]


def _precision():
    """MXU precision ladder (config.MXU_PRECISION, trace-time)."""
    return (jax.lax.Precision.DEFAULT if config.MXU_PRECISION == "default"
            else jax.lax.Precision.HIGHEST)


def _cmatmul_last(xre, xim, wre, wim):
    """[..., n] @ [n, m] complex matmul on split planes (4 real MXU matmuls)."""
    mm = partial(jnp.einsum, "...n,nm->...m", precision=_precision())
    return (mm(xre, wre) - mm(xim, wim), mm(xre, wim) + mm(xim, wre))


def _cmatmul_outer(cre, cim, wre, wim):
    """Contract axis -2 (j1) with W[j1, k1]: D[..., k1, k2] = sum_j C[..., j, k2] W[j, k1]."""
    mm = partial(jnp.einsum, "...jk,jm->...mk", precision=_precision())
    return (mm(cre, wre) - mm(cim, wim), mm(cre, wim) + mm(cim, wre))


def fft_tables(node: PlanNode):
    """Flatten a PlanNode tree into a pytree (list of dicts) of jnp arrays.

    Passed as jit arguments so large tables are runtime operands, not baked
    XLA constants.
    """
    out = []
    for level in node.leaves():
        d = {"w_re": jnp.asarray(level.w_re), "w_im": jnp.asarray(level.w_im)}
        if not level.is_direct:
            d["tw_re"] = jnp.asarray(level.tw_re)
            d["tw_im"] = jnp.asarray(level.tw_im)
        out.append(d)
    return out


def _shape_of(node: PlanNode):
    return [(lv.n, lv.n1, lv.n2) for lv in node.leaves()]


def apply_tables(xre, xim, tables, shape_info):
    """Run the recursive four-step transform given flattened tables.

    x: [..., n] split planes. shape_info: static list of (n, n1, n2) per level.
    """
    return _apply(xre, xim, tables, shape_info, 0)


def _apply(xre, xim, tables, shape_info, lvl):
    n, n1, n2 = shape_info[lvl]
    t = tables[lvl]
    if n1 is None:
        return _cmatmul_last(xre, xim, t["w_re"], t["w_im"])
    batch = xre.shape[:-1]
    # [..., n] -> [..., n2, n1]: element (j2, j1) is x[j1 + n1*j2].
    xre = xre.reshape(*batch, n2, n1)
    xim = xim.reshape(*batch, n2, n1)
    # Inner FFT_{n2} along what is now the last axis after the swap. XLA folds
    # this transpose into the adjacent dot's dimension numbers.
    xre = jnp.swapaxes(xre, -1, -2)
    xim = jnp.swapaxes(xim, -1, -2)
    bre, bim = _apply(xre, xim, tables, shape_info, lvl + 1)
    # Twiddle T[j1, k2] — elementwise complex multiply (4 VPU FMAs, fused by XLA).
    twre, twim = t["tw_re"], t["tw_im"]
    cre = bre * twre - bim * twim
    cim = bre * twim + bim * twre
    # Outer DFT over j1; result [..., k1, k2] flattens to X[k1*n2 + k2].
    dre, dim = _cmatmul_outer(cre, cim, t["w_re"], t["w_im"])
    return dre.reshape(*batch, n), dim.reshape(*batch, n)


def fft_planes(xre, xim, inverse: bool = False, dtype=None):
    """One-shot batched FFT on split planes (builds tables inline; for tests
    and as the always-correct fallback surface). x: [..., n]."""
    n = xre.shape[-1]
    np_dtype = np.dtype(dtype or xre.dtype)
    tree = build_tree(n, inverse=inverse, dtype=np_dtype)
    tables = fft_tables(tree)
    return apply_tables(xre, xim, tables, _shape_of(tree))
