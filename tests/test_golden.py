"""Tier 5: golden-value regression + output ordering.

Port of tests/golden_reference.test.js (inline precomputed spectra for
deterministic inputs — any output change fails) and tests/output-order.test.js
(per-bin-distinct signals targeting bit-reversal/permutation bugs).

Golden literals were generated once from the f64 reference DFT (analytically
exact values for ramp inputs) and are inlined — do NOT regenerate them to
make a failing kernel pass.
"""

import numpy as np
import pytest

from watfft_tpu import registry

# DFT of the N=8 ramp [0..7] (golden_reference.test.js:29-35 analog).
GOLDEN_RAMP8 = np.array([
    28.0 + 0.0j,
    -4.0 + 9.656854249492j,
    -4.0 + 4.0j,
    -4.0 + 1.656854249492j,
    -4.0 + 0.0j,
    -4.0 - 1.656854249492j,
    -4.0 - 4.0j,
    -4.0 - 9.656854249492j,
])

# real_dft of the N=16 ramp [0..15].
GOLDEN_RAMP16_REAL = np.array([
    120.0 + 0.0j,
    -8.0 + 40.218715937j,
    -8.0 + 19.313708499j,
    -8.0 + 11.9728461013j,
    -8.0 + 8.0j,
    -8.0 + 5.3454291034j,
    -8.0 + 3.313708499j,
    -8.0 + 1.591298939j,
    -8.0 + 0.0j,
])


@pytest.mark.parametrize("dtype,atol", [("float32", 1e-4), ("float64", 1e-9)])
def test_golden_complex_ramp8(dtype, atol):
    x = np.arange(8, dtype=np.float64).astype(np.complex128)
    got = np.asarray(registry.flagship("complex-forward", dtype).make(8)(x))
    np.testing.assert_allclose(got, GOLDEN_RAMP8, atol=atol)


@pytest.mark.parametrize("dtype,atol", [("float32", 5e-4), ("float64", 1e-8)])
def test_golden_real_ramp16(dtype, atol):
    x = np.arange(16, dtype=np.float64)
    got = np.asarray(registry.flagship("real-forward", dtype).make(16)(x))
    np.testing.assert_allclose(got, GOLDEN_RAMP16_REAL, atol=atol)


@pytest.mark.parametrize("n", [16, 64, 256])
def test_output_order(n):
    """Shifted impulses produce distinct per-bin phase ramps; a permutation
    bug anywhere in the pipeline scrambles them (output-order.test.js:1-11)."""
    for shift in (1, 3, n // 2):
        x = np.zeros(n, np.complex128)
        x[shift] = 1.0
        X = np.asarray(registry.flagship("complex-forward", "float32").make(n)(x),
                       np.complex128)
        expected = np.exp(-2j * np.pi * shift * np.arange(n) / n)
        np.testing.assert_allclose(X, expected, atol=n * 5e-6)
