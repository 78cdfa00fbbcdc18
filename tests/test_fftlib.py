"""jnp.fft-compatible namespace: parity with numpy.fft semantics."""

import numpy as np
import pytest

from watfft_tpu import fftlib


@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_fft_norms_match_numpy(norm):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (3, 256)) + 1j * rng.uniform(-1, 1, (3, 256))
    got = np.asarray(fftlib.fft(x, norm=norm))
    expected = np.fft.fft(x, norm=norm)
    np.testing.assert_allclose(got, expected, atol=2e-4)
    back = np.asarray(fftlib.ifft(got, norm=norm))
    np.testing.assert_allclose(back, x, atol=2e-4)


def test_axis_argument():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (64, 5)).astype(np.complex64)
    got = np.asarray(fftlib.fft(x, axis=0))
    np.testing.assert_allclose(got, np.fft.fft(x, axis=0), atol=64 * 5e-6)


def test_n_pad_and_truncate():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, 100).astype(np.complex64)
    got = np.asarray(fftlib.fft(x, n=128))
    np.testing.assert_allclose(got, np.fft.fft(x, n=128), atol=1e-3)
    got = np.asarray(fftlib.fft(x, n=64))
    np.testing.assert_allclose(got, np.fft.fft(x, n=64), atol=1e-3)


def test_rfft_irfft_roundtrip_with_norm():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (2, 512)).astype(np.float32)
    S = fftlib.rfft(x, norm="ortho")
    np.testing.assert_allclose(np.asarray(S), np.fft.rfft(x, norm="ortho"),
                               atol=2e-4)
    back = np.asarray(fftlib.irfft(S, norm="ortho"))
    np.testing.assert_allclose(back, x, atol=2e-4)


def test_fft2_matches_numpy():
    rng = np.random.default_rng(4)
    x = (rng.uniform(-1, 1, (128, 128))
         + 1j * rng.uniform(-1, 1, (128, 128))).astype(np.complex64)
    got = np.asarray(fftlib.fft2(x))
    np.testing.assert_allclose(got, np.fft.fft2(x), atol=2e-2)
    back = np.asarray(fftlib.ifft2(got))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_helpers_delegate():
    np.testing.assert_allclose(np.asarray(fftlib.fftfreq(8)), np.fft.fftfreq(8))
    x = np.arange(8.0)
    np.testing.assert_allclose(np.asarray(fftlib.fftshift(x)), np.fft.fftshift(x))
