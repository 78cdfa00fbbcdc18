"""Boundary cases: invalid sizes, minimum sizes, batch shapes.

Port of tests/boundary.test.js (reference: N=1/2, non-power-of-2, memory
limits; implementations may reject N=1 "acceptably", boundary.test.js:87-88 —
here rejection is explicit and typed).
"""

import numpy as np
import pytest

import watfft_tpu as wt
from watfft_tpu.reference import dft as ref


@pytest.mark.parametrize("bad", [0, 1, 3, 12, 100, -8, 2.5, "64"])
def test_invalid_complex_sizes_raise(bad):
    with pytest.raises((ValueError, TypeError)):
        wt.create_fft_f32(bad)


@pytest.mark.parametrize("bad", [0, 1, 2, 3, 12, -8])
def test_invalid_real_sizes_raise(bad):
    with pytest.raises((ValueError, TypeError)):
        wt.create_rfft_f32(bad)


def test_minimum_sizes_work():
    x = np.array([1.0 + 2j, 3.0 - 1j])
    got = np.asarray(wt.create_fft_f32(2).forward(x))
    np.testing.assert_allclose(got, ref.dft(x), atol=1e-5)

    xr = np.array([1.0, 2.0, 3.0, 4.0])
    got = np.asarray(wt.create_rfft_f32(4).forward(xr))
    np.testing.assert_allclose(got, ref.real_dft(xr), atol=1e-5)


def test_arbitrary_batch_shapes():
    ctx = wt.create_fft_f32(64)
    rng = ref.seeded_rng(9)
    for shape in [(64,), (5, 64), (2, 3, 64), (1, 1, 2, 64)]:
        x = rng.uniform(-1, 1, shape) + 1j * rng.uniform(-1, 1, shape)
        got = np.asarray(ctx.forward(x))
        assert got.shape == shape
        np.testing.assert_allclose(got, ref.dft(x), atol=64 * 5e-6)


def test_mismatched_size_raises():
    ctx = wt.create_fft_f32(64)
    with pytest.raises(Exception):
        np.asarray(ctx.forward(np.zeros(32, np.complex64)))


@pytest.mark.parametrize("shape", [(64,), (12, 64), (64, 12), (100, 100)])
def test_fft2_invalid_shapes_raise_typed(shape):
    """A bad shape must produce a typed ValueError at the API, never a raw
    Mosaic/kernel error (round-1 verdict weak #7)."""
    from watfft_tpu.ops.fft2 import validate_fft2_shape
    with pytest.raises(ValueError):
        validate_fft2_shape(shape)
    if len(shape) >= 2:
        with pytest.raises(ValueError):
            np.asarray(wt.fft2(np.zeros(shape, np.complex64)))


def test_fft2_small_unaligned_pow2_works():
    """[64, 64] (lane dim NOT a multiple of 128) must run via the planner's
    XLA fallback instead of dying inside the kernel."""
    rng = ref.seeded_rng(11)
    x = rng.uniform(-1, 1, (64, 64)) + 1j * rng.uniform(-1, 1, (64, 64))
    got = np.asarray(wt.fft2(x))
    want = np.fft.fft2(x)
    np.testing.assert_allclose(got, want, atol=64 * 1e-4)
    back = np.asarray(wt.ifft2(wt.fft2(x)))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_fft_large_too_small_raises_typed():
    from watfft_tpu.ops.large import fft_large
    import jax.numpy as jnp
    x = jnp.zeros(4096, jnp.float32)
    with pytest.raises(ValueError, match="2\\^14"):
        fft_large(x, x)


@pytest.mark.parametrize("kwargs", [
    {"n_fft": 100}, {"n_fft": 2}, {"n_fft": 1024, "hop": 0},
    {"n_fft": 1024, "hop": -4},
])
def test_stft_invalid_args_raise_typed(kwargs):
    from watfft_tpu import stft as S
    x = np.zeros(4096, np.float32)
    with pytest.raises(ValueError):
        S.stft(x, **kwargs)


def test_stft_short_signal_raises_typed():
    from watfft_tpu import stft as S
    with pytest.raises(ValueError, match="shorter"):
        S.stft(np.zeros(100, np.float32), n_fft=256)


def test_one_shot_functional_api():
    rng = ref.seeded_rng(10)
    x = rng.uniform(-1, 1, (2, 128)) + 1j * rng.uniform(-1, 1, (2, 128))
    np.testing.assert_allclose(np.asarray(wt.fft(x)), ref.dft(x), atol=128 * 5e-6)
    np.testing.assert_allclose(np.asarray(wt.ifft(wt.fft(x))), x, atol=1e-4)
    xr = rng.uniform(-1, 1, (2, 128))
    np.testing.assert_allclose(np.asarray(wt.rfft(xr)), ref.real_dft(xr),
                               atol=128 * 5e-6)
    np.testing.assert_allclose(np.asarray(wt.irfft(wt.rfft(xr))), xr, atol=1e-4)
