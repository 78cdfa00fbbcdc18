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


@pytest.mark.parametrize("shape,axes", [((12, 10), (-2, -1)),
                                        ((3, 6, 15), (-2, -1)),
                                        ((10, 8), (0, 1))])
def test_fft2_nonpow2_matches_numpy(shape, axes):
    """numpy parity for arbitrary 2D sizes: non-pow2 axes route through the
    1D any-n dispatch (Bluestein / native FFT) instead of raising from the
    pow2-only kernel validator (round-5 gap fix)."""
    rng = np.random.default_rng(10)
    z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    for norm in (None, "ortho"):
        got = np.asarray(fftlib.fft2(z, axes=axes, norm=norm))
        ref = np.fft.fft2(z, axes=axes, norm=norm)
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5
        back = np.asarray(fftlib.ifft2(got, axes=axes, norm=norm))
        assert np.max(np.abs(back - z)) < 1e-5


def test_helpers_delegate():
    np.testing.assert_allclose(np.asarray(fftlib.fftfreq(8)), np.fft.fftfreq(8))
    x = np.arange(8.0)
    np.testing.assert_allclose(np.asarray(fftlib.fftshift(x)), np.fft.fftshift(x))


@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_fftn_matches_numpy(norm):
    rng = np.random.default_rng(5)
    x = (rng.uniform(-1, 1, (8, 16, 32))
         + 1j * rng.uniform(-1, 1, (8, 16, 32))).astype(np.complex64)
    got = np.asarray(fftlib.fftn(x, norm=norm))
    np.testing.assert_allclose(got, np.fft.fftn(x, norm=norm), atol=2e-3)
    back = np.asarray(fftlib.ifftn(got, norm=norm))
    np.testing.assert_allclose(back, x, atol=2e-4)


def test_fftn_axes_and_s():
    rng = np.random.default_rng(6)
    x = (rng.uniform(-1, 1, (4, 16, 32))
         + 1j * rng.uniform(-1, 1, (4, 16, 32))).astype(np.complex64)
    got = np.asarray(fftlib.fftn(x, s=(8, 16), axes=(1, 2)))
    np.testing.assert_allclose(got, np.fft.fftn(x, s=(8, 16), axes=(1, 2)),
                               atol=2e-3)


@pytest.mark.parametrize("norm", [None, "ortho"])
def test_rfft2_matches_numpy(norm):
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (32, 64)).astype(np.float32)
    got = np.asarray(fftlib.rfft2(x, norm=norm))
    np.testing.assert_allclose(got, np.fft.rfft2(x, norm=norm), atol=2e-3)
    back = np.asarray(fftlib.irfft2(got, norm=norm))
    np.testing.assert_allclose(back, x, atol=2e-4)


@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_hfft_ihfft_match_numpy(norm):
    rng = np.random.default_rng(8)
    m = 33  # spectrum length for n=64
    x = (rng.uniform(-1, 1, m) + 1j * rng.uniform(-1, 1, m)).astype(np.complex64)
    got = np.asarray(fftlib.hfft(x, norm=norm))
    np.testing.assert_allclose(got, np.fft.hfft(x, norm=norm), atol=2e-3)
    y = rng.uniform(-1, 1, 64).astype(np.float32)
    got = np.asarray(fftlib.ihfft(y, norm=norm))
    np.testing.assert_allclose(got, np.fft.ihfft(y, norm=norm), atol=2e-5)


def test_mxu_precision_ladder(monkeypatch):
    """config.MXU_PRECISION='default' (single-pass bf16 fast tier) keeps the
    four-step surface working; accuracy is exercised on real MXU hardware by
    bench/accuracy tooling (CPU matmuls ignore the precision flag)."""
    from watfft_tpu import config
    from watfft_tpu.api import FFTContext
    monkeypatch.setattr(config, "MXU_PRECISION", "default")
    rng = np.random.default_rng(9)
    ctx = FFTContext(256, "float32")
    xre = rng.uniform(-1, 1, (4, 256)).astype(np.float32)
    xim = rng.uniform(-1, 1, (4, 256)).astype(np.float32)
    re, im = ctx.forward_planes_fourstep(xre, xim)
    ref = np.fft.fft(xre.astype(np.float64) + 1j * xim.astype(np.float64))
    got = np.asarray(re) + 1j * np.asarray(im)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-2


@pytest.mark.parametrize("n", [12, 97, 100, 1000])
def test_arbitrary_size_fft_matches_numpy(n):
    """Non-pow2 sizes route through the Bluestein chirp-z path (new scope
    beyond the pow2-only reference) and must match numpy."""
    rng = np.random.default_rng(n)
    x = (rng.uniform(-1, 1, (3, n)) + 1j * rng.uniform(-1, 1, (3, n)))
    got = np.asarray(fftlib.fft(x.astype(np.complex64)))
    ref = np.fft.fft(x)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6
    got = np.asarray(fftlib.ifft(x.astype(np.complex64), norm="ortho"))
    ref = np.fft.ifft(x, norm="ortho")
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6


@pytest.mark.parametrize("n", [12, 97, 1000])
def test_arbitrary_size_rfft_matches_numpy(n):
    rng = np.random.default_rng(n + 1)
    x = rng.uniform(-1, 1, (3, n))
    got = np.asarray(fftlib.rfft(x.astype(np.float32)))
    ref = np.fft.rfft(x)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6


@pytest.mark.parametrize("n", [12, 13, 97, 98, 101])
def test_arbitrary_size_irfft_matches_numpy(n):
    """Both parities; odd n uses the last bin's imaginary part exactly like
    numpy (there is no Nyquist bin) — previously a ValueError."""
    rng = np.random.default_rng(n + 2)
    m = n // 2 + 1
    spec = (rng.uniform(-1, 1, (3, m))
            + 1j * rng.uniform(-1, 1, (3, m))).astype(np.complex64)
    got = np.asarray(fftlib.irfft(spec, n=n))
    ref = np.fft.irfft(spec, n=n)
    assert np.max(np.abs(got - ref)) < 1e-5
