"""Host-side plan layer: factorization policy + f64-precise constant tables.

This is the TPU-native analog of the reference's `precompute_*` exports and
module-dispatch logic (reference: modules/fft_split_native_f32.wat:151-265
`precompute_twiddles_split`/`$build_r4_tables`, index.js:69-178 context
factories). Differences by design:

* Twiddles/DFT matrices are computed in **numpy float64 on host** and cast to
  the kernel dtype — fixing the reference's known f64 accuracy plateau caused
  by its in-WASM Taylor-series trig (docs/OPTIMIZATION_PLAN.md:150).
* Instead of radix-4 butterfly twiddle triples, the tables are **DFT matrices
  per factor + per-level four-step twiddle grids**, because on TPU the hot
  compute is MXU matmuls over a batch, not lane-shuffled butterflies
  (SURVEY.md §7 design stance).
* The native inverse folds the 1/N normalization into the final-stage DFT
  matrix (the reference folds 1/N into the final butterfly stage,
  modules/fft_stockham_f32_dual.wat:1336-1337) — the inverse costs exactly the
  same passes as the forward.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

__all__ = ["DIRECT_MAX", "factorize", "build_tree", "PlanNode", "dft_matrix"]

# Largest factor computed as a single DFT matmul on the MXU. 128 matches both
# the MXU systolic dimension and the VPU lane width (override: WATFFT_DIRECT_MAX).
from .config import DIRECT_MAX  # noqa: E402


def is_power_of_two(n: int) -> bool:
    return n >= 1 and (n & (n - 1)) == 0


def dft_matrix(n: int, sign: float, dtype=np.float64, scale: float = 1.0):
    """(W_re, W_im) for W[j, k] = scale * exp(sign * 2i pi j k / n).

    The phase index j*k is reduced mod n BEFORE the trig call, so arguments
    stay in [0, 2pi) and f64 sin/cos are fully accurate — the fix for the
    reference's f64 accuracy plateau caused by large-argument trig
    (docs/OPTIMIZATION_PLAN.md:150; cross-validated against the long-double
    native oracle, native/watfft_native.cpp)."""
    k = np.arange(n, dtype=np.int64)
    ang = sign * 2.0 * np.pi * (np.outer(k, k) % n) / n
    return (scale * np.cos(ang)).astype(dtype), (scale * np.sin(ang)).astype(dtype)


def twiddle_grid(n1: int, n2: int, sign: float, dtype=np.float64):
    """Four-step twiddle grid T[j1, k2] = exp(sign * 2i pi j1 k2 / (n1*n2)),
    with mod-n phase reduction (see dft_matrix)."""
    n = n1 * n2
    jk = np.outer(np.arange(n1, dtype=np.int64), np.arange(n2, dtype=np.int64)) % n
    ang = sign * 2.0 * np.pi * jk / n
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def factorize(n: int, direct_max: int = DIRECT_MAX) -> tuple[int, ...]:
    """Split n into factors (outermost first), each <= direct_max.

    Balanced splits minimize sum-of-factors (the MXU FLOP count is
    n * sum(factors)); each recursion level splits the remaining size roughly
    in half in log-space, capping at direct_max.
    """
    if not is_power_of_two(n):
        raise ValueError(f"n must be a power of two, got {n}")
    if n <= direct_max:
        return (n,)
    log = n.bit_length() - 1
    n1 = 1 << min((log + 1) // 2, direct_max.bit_length() - 1)
    return (n1,) + factorize(n // n1, direct_max)


@dataclass
class PlanNode:
    """One level of the recursive four-step decomposition.

    direct (n2 is None): one [n, n] DFT matmul.
    composite: n = n1 * n2; inner FFT_{n2} (recursive), twiddle [n1, n2],
    outer DFT matmul with W_{n1}.
    """

    n: int
    w_re: np.ndarray  # direct: [n, n];  composite: [n1, n1] outer matrix
    w_im: np.ndarray
    n1: Optional[int] = None
    n2: Optional[int] = None
    tw_re: Optional[np.ndarray] = None  # composite: [n1, n2]
    tw_im: Optional[np.ndarray] = None
    inner: Optional["PlanNode"] = None

    @property
    def is_direct(self) -> bool:
        return self.inner is None

    def leaves(self):
        node = self
        while node is not None:
            yield node
            node = node.inner


def build_tree(
    n: int,
    inverse: bool = False,
    dtype=np.float32,
    direct_max: int = DIRECT_MAX,
    _scale: Optional[float] = None,
) -> PlanNode:
    """Build the constant tree for an n-point transform.

    The inverse tree uses sign=+1 (conjugated tables — reference analog:
    fft_split_native_f32.wat STAGE_TW_INV at :196-265) and folds 1/n into the
    outermost matmul so no separate normalization pass exists.
    """
    sign = +1.0 if inverse else -1.0
    scale = _scale if _scale is not None else ((1.0 / n) if inverse else 1.0)
    if n <= direct_max:
        w_re, w_im = dft_matrix(n, sign, dtype, scale=scale)
        return PlanNode(n=n, w_re=w_re, w_im=w_im)
    log = n.bit_length() - 1
    n1 = 1 << min((log + 1) // 2, direct_max.bit_length() - 1)
    n2 = n // n1
    w_re, w_im = dft_matrix(n1, sign, dtype, scale=scale)
    tw_re, tw_im = twiddle_grid(n1, n2, sign, dtype)
    inner = build_tree(n2, inverse, dtype, direct_max, _scale=1.0)
    return PlanNode(n=n, n1=n1, n2=n2, w_re=w_re, w_im=w_im,
                    tw_re=tw_re, tw_im=tw_im, inner=inner)
