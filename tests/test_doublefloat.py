"""Double-f32 (TPU-native f64 tier) accuracy tests.

The df kernel must beat the reference's f64 accuracy plateau (~5e-11,
SURVEY.md §6) and stay inside the f64 thresholds (MAX_REL 1e-9)."""

import numpy as np
import pytest

from watfft_tpu.ops import doublefloat as df
from watfft_tpu.reference import dft as ref


def _to_planes(x):
    rh, rl = df.split_f64(np.ascontiguousarray(x.real.T))
    ih, il = df.split_f64(np.ascontiguousarray(x.imag.T))
    return rh, rl, ih, il


def _from_planes(planes):
    rh, rl, ih, il = (np.asarray(p) for p in planes)
    return (df.merge_f64(rh, rl) + 1j * df.merge_f64(ih, il)).T


def test_split_merge_roundtrip():
    rng = ref.seeded_rng(0)
    x = rng.uniform(-1, 1, 1000)
    hi, lo = df.split_f64(x)
    err = np.max(np.abs(df.merge_f64(hi, lo) - x))
    assert err < 1e-14


@pytest.mark.parametrize("n", [4, 8, 16, 64, 1024])
def test_df_fft_accuracy(n):
    rng = ref.seeded_rng(n)
    x = rng.uniform(-1, 1, (128, n)) + 1j * rng.uniform(-1, 1, (128, n))
    planes = _to_planes(x)
    out = df.df_fft_nb(*planes)
    got = _from_planes(out)
    expected = ref.dft(x)
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    # well below the f64 MAX_REL threshold 1e-9 and the reference's 5e-11
    assert err < 1e-11, f"n={n} err={err:.3e}"


@pytest.mark.parametrize("n", [8, 64, 256])
def test_df_native_inverse_roundtrip(n):
    rng = ref.seeded_rng(n + 1)
    x = rng.uniform(-1, 1, (128, n)) + 1j * rng.uniform(-1, 1, (128, n))
    planes = df.df_fft_nb(*_to_planes(x))
    back = df.df_fft_nb(*planes, inverse=True)
    err = np.max(np.abs(_from_planes(back) - x))
    assert err < 1e-11, f"n={n} err={err:.3e}"


@pytest.mark.parametrize("n", [16, 64, 512])
def test_df_real_forward_and_inverse(n):
    rng = ref.seeded_rng(n + 2)
    x = rng.uniform(-1, 1, (128, n))
    xh, xl = df.split_f64(np.ascontiguousarray(x.T))
    out = df.df_rfft_nb(xh, xl)
    got = (df.merge_f64(np.asarray(out[0]), np.asarray(out[1]))
           + 1j * df.merge_f64(np.asarray(out[2]), np.asarray(out[3]))).T
    expected = ref.real_dft(x)
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    assert err < 1e-11, f"n={n} err={err:.3e}"
    bh, bl = df.df_irfft_nb(*out)
    back = df.merge_f64(np.asarray(bh), np.asarray(bl)).T
    assert np.max(np.abs(back - x)) < 1e-11
