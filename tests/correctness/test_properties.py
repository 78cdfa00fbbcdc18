"""Tier 2: mathematical-property (metamorphic) tests.

Port of tests/correctness/ (reference): roundtrip (fft.roundtrip.test.js),
Parseval energy conservation (fft.parseval.test.js), linearity
(fft.linearity.test.js), time-shift <-> phase-rotation theorem
(fft.shift.test.js), known analytical values (fft.known-values.test.js).
"""

import numpy as np
import pytest

from watfft_tpu import registry
from watfft_tpu.reference import dft as ref
from watfft_tpu.utils import tolerances as tol

SIZES = [4, 16, 64, 256, 1024]
DTYPES = ["float32", "float64"]


def _fwd(dtype, n):
    return registry.flagship("complex-forward", dtype).make(n)


def _inv(dtype, n):
    return registry.flagship("complex-inverse", dtype).make(n)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("n", SIZES)
def test_roundtrip(n, dtype):
    rng = ref.seeded_rng(n)
    x = rng.uniform(-1, 1, (4, n)) + 1j * rng.uniform(-1, 1, (4, n))
    back = np.asarray(_inv(dtype, n)(_fwd(dtype, n)(x)), np.complex128)
    assert np.max(np.abs(back - x)) < tol.ROUNDTRIP[dtype]


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("n", SIZES)
def test_real_roundtrip(n, dtype):
    rng = ref.seeded_rng(n + 1)
    x = rng.uniform(-1, 1, (4, n))
    fwd = registry.flagship("real-forward", dtype).make(n)
    inv = registry.flagship("real-inverse", dtype).make(n)
    back = np.asarray(inv(fwd(x)), np.float64)
    assert np.max(np.abs(back - x)) < tol.ROUNDTRIP[dtype]


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("n", SIZES)
def test_parseval(n, dtype):
    """sum |X|^2 == N * sum |x|^2 for the unnormalized forward transform."""
    rng = ref.seeded_rng(n + 2)
    x = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
    X = np.asarray(_fwd(dtype, n)(x), np.complex128)
    lhs = np.sum(np.abs(X) ** 2)
    rhs = n * np.sum(np.abs(x) ** 2)
    rtol = 1e-5 if dtype == "float32" else 1e-10
    assert abs(lhs - rhs) < rtol * rhs


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("n", SIZES)
def test_linearity(n, dtype):
    rng = ref.seeded_rng(n + 3)
    x = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
    y = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
    a, b = 2.5, -1.25
    fwd = _fwd(dtype, n)
    lhs = np.asarray(fwd(a * x + b * y), np.complex128)
    rhs = a * np.asarray(fwd(x), np.complex128) + b * np.asarray(fwd(y), np.complex128)
    scale = np.max(np.abs(rhs))
    assert np.max(np.abs(lhs - rhs)) < tol.MAX_REL[dtype] * 4 * scale


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("n", SIZES)
def test_time_shift_phase_rotation(n, dtype):
    """FFT(x shifted by s)[k] == FFT(x)[k] * exp(-2i pi k s / N)."""
    rng = ref.seeded_rng(n + 4)
    x = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
    s = 3 % n
    fwd = _fwd(dtype, n)
    shifted = np.roll(x, -s)
    lhs = np.asarray(fwd(shifted), np.complex128)
    phase = np.exp(-2j * np.pi * np.arange(n) * (-s) / n)
    rhs = np.asarray(fwd(x), np.complex128) * phase
    scale = np.max(np.abs(rhs))
    assert np.max(np.abs(lhs - rhs)) < tol.MAX_REL[dtype] * 8 * scale


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("n", [8, 64, 512])
def test_known_values(n, dtype):
    fwd = _fwd(dtype, n)
    atol = n * (5e-6 if dtype == "float32" else 1e-10)
    # impulse -> all-ones spectrum
    X = np.asarray(fwd(ref.make_signal("impulse", n)), np.complex128)
    np.testing.assert_allclose(X, np.ones(n), atol=atol)
    # constant -> N at DC
    X = np.asarray(fwd(ref.make_signal("constant", n)), np.complex128)
    expected = np.zeros(n, np.complex128); expected[0] = n
    np.testing.assert_allclose(X, expected, atol=atol)
    # single frequency k=1 -> N at bin 1
    X = np.asarray(fwd(ref.make_signal("single_freq", n)), np.complex128)
    expected = np.zeros(n, np.complex128); expected[1] = n
    np.testing.assert_allclose(X, expected, atol=atol)
    # alternating -> N at Nyquist
    X = np.asarray(fwd(ref.make_signal("alternating", n)), np.complex128)
    expected = np.zeros(n, np.complex128); expected[n // 2] = n
    np.testing.assert_allclose(X, expected, atol=atol)
