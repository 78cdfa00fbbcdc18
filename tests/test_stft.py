"""STFT/spectrogram pipeline tests (playground DSP analog)."""

import numpy as np
import pytest

from watfft_tpu import stft as S


def test_windows_match_known_formulas():
    n = 64
    t = np.arange(n) / n
    np.testing.assert_allclose(S.get_window("hann", n),
                               0.5 - 0.5 * np.cos(2 * np.pi * t), atol=1e-7)
    assert S.get_window("rect", n).sum() == n
    for name in ("hamming", "blackman", "blackman-harris"):
        w = S.get_window(name, n)
        assert w.shape == (n,) and np.all(np.isfinite(w))


def test_frame_shapes_and_content():
    x = np.arange(100, dtype=np.float32)
    f = np.asarray(S.frame(x, 16, 4))
    assert f.shape == ((100 - 16) // 4 + 1, 16)
    np.testing.assert_array_equal(f[0], x[:16])
    np.testing.assert_array_equal(f[3], x[12:28])


def test_stft_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 2048).astype(np.float32)
    n_fft, hop = 256, 64
    re, im = S.stft(x, n_fft=n_fft, hop=hop, window="hann")
    got = np.asarray(re) + 1j * np.asarray(im)
    w = S.get_window("hann", n_fft).astype(np.float64)
    num = (len(x) - n_fft) // hop + 1
    for i in (0, num // 2, num - 1):
        expected = np.fft.rfft(x[i * hop: i * hop + n_fft].astype(np.float64) * w)
        np.testing.assert_allclose(got[i], expected, atol=n_fft * 5e-6)


def test_stft_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, 4096).astype(np.float32)
    n_fft, hop = 512, 128
    re, im = S.stft(x, n_fft=n_fft, hop=hop)
    back = np.asarray(S.istft(re, im, n_fft=n_fft, hop=hop, length=len(x)))
    # interior reconstruction is exact under COLA; edges are attenuated
    assert np.max(np.abs(back[n_fft:-n_fft] - x[n_fft:-n_fft])) < 1e-4


def test_spectrogram_and_mel():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (2, 2048)).astype(np.float32)
    p = np.asarray(S.spectrogram(x, n_fft=256, hop=128, log=False))
    assert p.shape == (2, (2048 - 256) // 128 + 1, 129)
    assert np.all(p >= 0)
    fb = S.mel_filterbank(40, 256, 16000.0)
    assert fb.shape == (40, 129)
    mel = p @ fb.T
    assert np.all(np.isfinite(mel))


def test_fftconvolve_matches_numpy():
    rng = np.random.default_rng(11)
    for t, k in ((100, 7), (1000, 33), (64, 64)):
        x = rng.uniform(-1, 1, t).astype(np.float32)
        h = rng.uniform(-1, 1, k).astype(np.float32)
        exp = np.convolve(x.astype(np.float64), h.astype(np.float64))
        got = np.asarray(S.fftconvolve(x, h))
        scale = np.max(np.abs(exp))
        assert got.shape == (t + k - 1,)
        np.testing.assert_allclose(got, exp, atol=scale * 1e-5)


def test_fftconvolve_modes_and_batch():
    rng = np.random.default_rng(12)
    t, k, b = 128, 17, 3
    x = rng.uniform(-1, 1, (b, t)).astype(np.float32)
    h = rng.uniform(-1, 1, k).astype(np.float32)
    full = np.asarray(S.fftconvolve(x, h, mode="full"))
    same = np.asarray(S.fftconvolve(x, h, mode="same"))
    valid = np.asarray(S.fftconvolve(x, h, mode="valid"))
    assert full.shape == (b, t + k - 1)
    assert same.shape == (b, t)
    assert valid.shape == (b, t - k + 1)
    for i in range(b):
        exp = np.convolve(x[i].astype(np.float64), h.astype(np.float64))
        scale = np.max(np.abs(exp))
        np.testing.assert_allclose(full[i], exp, atol=scale * 1e-5)
        np.testing.assert_allclose(same[i], exp[(k - 1) // 2:(k - 1) // 2 + t],
                                   atol=scale * 1e-5)
        np.testing.assert_allclose(valid[i], exp[k - 1:t], atol=scale * 1e-5)


def test_fftconvolve_rejects_bad_args():
    x = np.ones(8, np.float32)
    with pytest.raises(ValueError):
        S.fftconvolve(x, np.ones(16, np.float32), mode="valid")
    with pytest.raises(ValueError):
        S.fftconvolve(x, np.ones(4, np.float32), mode="banana")
