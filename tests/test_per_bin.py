"""Tier 4: per-bin validation — one pure sinusoid per bin, all energy must
land in exactly that bin.

Port of tests/per_bin_validation.test.js (f64, sizes 8-256, tol N*1e-10) and
tests/per_bin_f32.test.js (f32, tol N*5e-6) — "the test class that would have
caught the historical rfft_32 bins-9-15 bug" (reference,
docs/OPTIMIZATION_PLAN.md:160). All N bins are validated in ONE batched
transform: row k of the input matrix is exp(2i pi k t / N), so the expected
spectrum matrix is N * I.
"""

import numpy as np
import pytest

from watfft_tpu import registry
from watfft_tpu.utils.tolerances import PER_BIN

CASES = [("float64", [8, 16, 32, 64, 128, 256]),
         ("float32", [8, 16, 32, 64, 128, 256, 512, 1024])]


@pytest.mark.parametrize("dtype,sizes", CASES)
def test_per_bin_complex(dtype, sizes):
    for n in sizes:
        t = np.arange(n)
        basis = np.exp(2j * np.pi * np.outer(np.arange(n), t) / n)  # [bin, time]
        for e in registry.entries("complex-forward", dtype):
            if not (e.min_size <= n <= e.max_size):
                continue
            X = np.asarray(e.make(n)(basis), np.complex128)
            err = np.max(np.abs(X - n * np.eye(n)))
            assert err < PER_BIN[dtype](n), f"{e.name} n={n} err={err:.3e}"


@pytest.mark.parametrize("dtype,sizes", CASES)
def test_per_bin_real(dtype, sizes):
    """cos(2 pi k t / N) per row: bin k gets N/2 (N at DC/Nyquist), all other
    bins zero (reference: per_bin_f32.test.js covers rfft_split)."""
    for n in sizes:
        m = n // 2
        t = np.arange(n)
        basis = np.cos(2 * np.pi * np.outer(np.arange(m + 1), t) / n)  # [bin, time]
        expected = np.zeros((m + 1, m + 1))
        np.fill_diagonal(expected, n / 2)
        expected[0, 0] = n
        expected[m, m] = n
        for e in registry.entries("real-forward", dtype):
            if not (e.min_size <= n <= e.max_size):
                continue
            X = np.asarray(e.make(n)(basis), np.complex128)
            err = np.max(np.abs(X - expected))
            assert err < PER_BIN[dtype](n), f"{e.name} n={n} err={err:.3e}"
