"""Large-N FFT (N = 2^13 .. 2^20+) via the four-step decomposition.

New scope beyond the reference, whose max size is bounded by its WASM linear
memory layout (8192/16384 points — SURVEY.md §5 long-context note;
docs/MEMORY.md:139-153). The TPU analog tiles the transform through VMEM:

  N = n1 * n2, x[j1 + n1*j2]
  1. view planes [N] -> [n2, n1]: column j1 IS the stride-n1 subsequence in
     time-major layout -> ONE batched Stockham kernel call (n=n2, batch=n1),
     no transpose needed.
  2. twiddle B[k2, j1] *= w_N^{j1*k2} (elementwise, XLA-fused with step 3's
     transpose).
  3. transpose [n2, n1] -> [n1, n2] (the single unavoidable relayout).
  4. second batched kernel call (n=n1, batch=n2) -> D[k1, k2]; the flat
     result is already in natural order X[k1*n2 + k2].

Inverse: conjugate twiddles, inverse kernels; 1/N = (1/n1)*(1/n2) comes for
free from the two native normalized inverse kernels.
"""

from __future__ import annotations

import functools

import numpy as np
import jax

from .pallas_stockham import stockham_fft_nb, stockham_fft_nb_postmul

__all__ = ["fft_large", "large_split"]


def large_split(n: int) -> tuple[int, int]:
    """Balanced power-of-two split with both factors >= 128 when possible
    (the kernel's lane minimum) and each <= 4096 (kernel max)."""
    log = n.bit_length() - 1
    l1 = min(max((log + 1) // 2, 7, log - 12), 12)
    n1 = 1 << l1
    return n1, n // n1


class _TwCache:
    _c: dict = {}

    @classmethod
    def get(cls, n, n1, n2, inverse):
        key = (n, n1, inverse)
        if key not in cls._c:
            sign = +1.0 if inverse else -1.0
            # T[k2, j1] = w_N^{j1*k2} matching the [n2, n1] layout of step 1's
            # output (rows k2, cols j1). f64 host math. numpy-only cache —
            # device arrays created under a trace must not be cached.
            ang = sign * 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n
            cls._c[key] = (np.cos(ang).astype(np.float32),
                           np.sin(ang).astype(np.float32))
        return cls._c[key]


@functools.partial(jax.jit, static_argnames=("n1", "n2", "inverse"))
def _fft_large(xre, xim, twre, twim, n1, n2, inverse):
    # step 1+2: inner FFTs down the columns with the four-step twiddle
    # fused into the kernel's store epilogue (Exp 14: the standalone XLA
    # multiply pass cost ~40us/dir at 2^20)
    xre = xre.reshape(n2, n1)
    xim = xim.reshape(n2, n1)
    cre, cim = stockham_fft_nb_postmul(xre, xim, twre, twim, inverse=inverse)
    # step 3: the one unavoidable transpose (pure relayout, XLA)
    cre = cre.T
    cim = cim.T
    # step 4: outer FFTs -> D[k1, k2]; flat order is the natural output
    dre, dim = stockham_fft_nb(cre, cim, inverse=inverse)
    return dre.reshape(-1), dim.reshape(-1)


def fft_large(xre, xim, inverse: bool = False):
    """FFT of a single large transform on flat planes [N] (f32).

    N must be a power of two with N >= 2^14 (both factors >= 128). For
    batches, vmap/loop at the caller — the transform itself already fills
    the machine.
    """
    n = xre.shape[-1]
    n1, n2 = large_split(n)
    if min(n1, n2) < 128:
        raise ValueError(
            f"fft_large requires N >= 2^14 so both factors reach the 128-lane "
            f"minimum (got N={n} -> {n1}x{n2}); use the direct kernel instead")
    twre, twim = _TwCache.get(n, n1, n2, inverse)
    return _fft_large(xre, xim, twre, twim, n1, n2, inverse)
