"""Tier 1: reference-DFT equivalence for every surface x size x signal.

Port of tests/fft.test.js, tests/combined.test.js, tests/fft_f32_dual.test.js,
tests/fft_split_native.test.js, tests/rfft.test.js, tests/ifft.test.js
(reference, sizes 4-4096): every registered implementation is checked against
the O(N^2) f64 DFT on the full deterministic signal set, batched in one call.
"""

import numpy as np
import pytest

from watfft_tpu import registry
from watfft_tpu.reference import dft as ref
from watfft_tpu.utils import tolerances as tol

SIZES = [4, 8, 16, 32, 64, 128, 256, 512, 1024]
SIZES_LARGE = [2048, 4096]


def _signal_batch(n: int) -> np.ndarray:
    return np.stack([fn(n) for fn in ref.SIGNALS.values()])


def _real_signal_batch(n: int) -> np.ndarray:
    return np.stack([fn(n) for fn in ref.REAL_SIGNALS.values()])


def _assert_close(got, expected, dtype, n):
    got = np.asarray(got, np.complex128)
    scale = np.maximum(np.max(np.abs(expected), axis=-1, keepdims=True), 1e-30)
    err = np.max(np.abs(got - expected) / scale)
    assert err < tol.MAX_REL[dtype] * 4, f"n={n} dtype={dtype} err={err:.3e}"


@pytest.mark.parametrize("dtype", ["float32", "float64"])
@pytest.mark.parametrize("n", SIZES + SIZES_LARGE)
def test_complex_forward(n, dtype):
    x = _signal_batch(n)
    expected = ref.dft(x)
    for e in registry.entries("complex-forward", dtype):
        if not (e.min_size <= n <= e.max_size):
            continue
        _assert_close(e.make(n)(x), expected, dtype, n)


@pytest.mark.parametrize("dtype", ["float32", "float64"])
@pytest.mark.parametrize("n", SIZES + SIZES_LARGE)
def test_complex_inverse(n, dtype):
    x = _signal_batch(n)
    expected = ref.idft(x)
    for e in registry.entries("complex-inverse", dtype):
        if not (e.min_size <= n <= e.max_size):
            continue
        _assert_close(e.make(n)(x), expected, dtype, n)


@pytest.mark.parametrize("dtype", ["float32", "float64"])
@pytest.mark.parametrize("n", SIZES[1:] + SIZES_LARGE)
def test_real_forward(n, dtype):
    x = _real_signal_batch(n)
    expected = ref.real_dft(x)
    for e in registry.entries("real-forward", dtype):
        if not (e.min_size <= n <= e.max_size):
            continue
        _assert_close(e.make(n)(x), expected, dtype, n)


@pytest.mark.parametrize("dtype", ["float32", "float64"])
@pytest.mark.parametrize("n", SIZES[1:] + SIZES_LARGE)
def test_real_inverse(n, dtype):
    x = _real_signal_batch(n)
    spec = ref.real_dft(x)
    for e in registry.entries("real-inverse", dtype):
        if not (e.min_size <= n <= e.max_size):
            continue
        got = np.asarray(e.make(n)(spec), np.float64)
        err = np.max(np.abs(got - x))
        assert err < tol.ROUNDTRIP[dtype], f"n={n} dtype={dtype} err={err:.3e}"


def test_rfft_matches_complex_with_zero_imag():
    """Real FFT result == complex FFT of the same signal with zero imaginary
    part, on the Hermitian-unique half (reference: tests/rfft.test.js)."""
    rng = ref.seeded_rng(7)
    for n in (16, 128, 1024):
        x = rng.uniform(-1, 1, (3, n))
        full = np.asarray(registry.flagship("complex-forward", "float32").make(n)(
            x.astype(np.complex64)))
        half = np.asarray(registry.flagship("real-forward", "float32").make(n)(x))
        np.testing.assert_allclose(half, full[..., : n // 2 + 1], atol=n * 5e-6)


@pytest.mark.parametrize("n", [3, 12, 97, 360])
def test_bluestein_matches_reference_dft(n):
    """ops/bluestein.py vs the O(N^2) oracle at arbitrary (non-pow2) n."""
    import jax.numpy as jnp
    from watfft_tpu.ops.bluestein import bluestein_fft_nb
    rng = ref.seeded_rng(n)
    x = rng.uniform(-1, 1, (n, 2)) + 1j * rng.uniform(-1, 1, (n, 2))
    re, im = bluestein_fft_nb(jnp.asarray(x.real, jnp.float32),
                              jnp.asarray(x.imag, jnp.float32))
    got = np.asarray(re) + 1j * np.asarray(im)
    expected = np.fft.fft(x, axis=0)
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    assert err < 5e-6, err
    bre, bim = bluestein_fft_nb(re, im, inverse=True)
    assert np.max(np.abs((np.asarray(bre) + 1j * np.asarray(bim)) - x)) < 1e-5


@pytest.mark.parametrize("n", [16, 64, 256, 512])
def test_real_3d_native_layout(n):
    """The real path's native sublane-folded 3D layout [n, 8, W] (Exp 37):
    a free host reshape of [n, batch]; hybrid kernels rank-dispatch on it,
    the Hermitian passes run directly on 3D planes, and the result matches
    np.fft plus roundtrips. Covers the public context entry too."""
    import jax.numpy as jnp
    from watfft_tpu.ops.pallas_rfft import rfft_nb, irfft_nb
    from watfft_tpu.api import RFFTContext
    rng = ref.seeded_rng(n + 1)
    W = 128
    b = 8 * W
    x2 = rng.uniform(-1, 1, (n, b)).astype(np.float32)
    x3 = jnp.asarray(x2.reshape(n, 8, W))
    re, im = rfft_nb(x3)
    got = (np.asarray(re) + 1j * np.asarray(im)).reshape(n // 2 + 1, b)
    expected = np.fft.rfft(x2.astype(np.float64), axis=0)
    assert np.max(np.abs(got - expected)) / np.max(np.abs(expected)) < 5e-6
    back = np.asarray(irfft_nb(re, im)).reshape(n, b)
    assert np.max(np.abs(back - x2)) < 1e-4
    # public context entry rank-dispatches to the same path
    ctx = RFFTContext(n, "float32")
    re2, im2 = ctx.forward_planes_nb(x3)
    np.testing.assert_allclose(np.asarray(re2), np.asarray(re), atol=1e-6)
    back2 = np.asarray(ctx.inverse_planes_nb(re2, im2)).reshape(n, b)
    assert np.max(np.abs(back2 - x2)) < 1e-4


@pytest.mark.parametrize("n", [64, 512, 2048])
def test_fused_mirror_lane_concat(n, monkeypatch):
    """Exp 41: the lane-concat mirror variant (_mirror_rows_many — one
    [G, G] @ [G, 2*nb*b] dot for re+im and all row blocks) must produce
    bit-identical spectra to the per-block mirror, both directions."""
    import jax.numpy as jnp
    from watfft_tpu import config
    from watfft_tpu.ops import pallas_rfft as pr
    rng = ref.seeded_rng(n)
    x = jnp.asarray(rng.uniform(-1, 1, (n, 128)).astype(np.float32))
    monkeypatch.setattr(config, "RFFT_MIRROR_LC_SIZES", frozenset())
    re0, im0 = pr._rfft_fused_impl(x)
    y0 = pr._irfft_fused_impl(re0, im0)
    monkeypatch.setattr(config, "RFFT_MIRROR_LC_SIZES", frozenset({n}))
    re1, im1 = pr._rfft_fused_impl(x)
    y1 = pr._irfft_fused_impl(re1, im1)
    np.testing.assert_allclose(np.asarray(re1), np.asarray(re0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(im1), np.asarray(im0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
    expected = np.fft.rfft(np.asarray(x, np.float64), axis=0)
    got = np.asarray(re1) + 1j * np.asarray(im1)
    assert np.max(np.abs(got - expected)) / np.max(np.abs(expected)) < 5e-6
