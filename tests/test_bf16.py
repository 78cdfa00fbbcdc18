"""Kernel I/O-tier tests: bf16 interop tier (Exp 26) and the native
sublane-folded 3D layout (Exp 28).

The Stockham kernel accepts bfloat16 planes: HBM traffic halves (the kernel
is memory-bound), butterflies run in f32 in-kernel, so accuracy is bounded
by the I/O rounding (~2^-8 relative). jnp.fft has no bf16 complex transform,
so this tier is validated against the f64 reference DFT directly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from watfft_tpu.ops.pallas_stockham import stockham_fft_nb
from watfft_tpu.reference import dft as ref


@pytest.mark.parametrize("n", [16, 256, 1024])
def test_bf16_tier_accuracy(n):
    rng = ref.seeded_rng(n)
    b = 128
    xre = rng.uniform(-1, 1, (n, b)).astype(np.float32)
    xim = rng.uniform(-1, 1, (n, b)).astype(np.float32)
    yre, yim = stockham_fft_nb(jnp.asarray(xre, jnp.bfloat16),
                               jnp.asarray(xim, jnp.bfloat16))
    assert yre.dtype == jnp.bfloat16
    got = (np.asarray(yre.astype(jnp.float32))
           + 1j * np.asarray(yim.astype(jnp.float32)))
    expected = ref.dft(xre.T + 1j * xim.T).T
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    # input rounding alone is ~2^-8 = 3.9e-3; transform accumulation adds a
    # small factor on top
    assert err < 3e-2, err


def test_bf16_tier_roundtrip():
    rng = ref.seeded_rng(7)
    n, b = 512, 256
    xre = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32),
                      jnp.bfloat16)
    xim = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32),
                      jnp.bfloat16)
    fre, fim = stockham_fft_nb(xre, xim)
    bre, bim = stockham_fft_nb(fre, fim, inverse=True)
    d = np.max(np.abs(np.asarray(bre.astype(jnp.float32))
                      - np.asarray(xre.astype(jnp.float32))))
    assert d < 5e-2, d


# -- native sublane-folded 3D layout (Exp 28) -------------------------------

@pytest.mark.parametrize("n", [16, 64, 128, 256])
def test_native_3d_layout_matches_2d(n):
    rng = ref.seeded_rng(n + 1)
    b = 1024
    xre = rng.uniform(-1, 1, (n, b)).astype(np.float32)
    xim = rng.uniform(-1, 1, (n, b)).astype(np.float32)
    y2re, y2im = stockham_fft_nb(jnp.asarray(xre), jnp.asarray(xim))
    a3 = jnp.asarray(xre.reshape(n, 8, b // 8))
    c3 = jnp.asarray(xim.reshape(n, 8, b // 8))
    y3re, y3im = stockham_fft_nb(a3, c3)
    assert y3re.shape == (n, 8, b // 8)
    assert np.array_equal(np.asarray(y3re).reshape(n, b), np.asarray(y2re))
    assert np.array_equal(np.asarray(y3im).reshape(n, b), np.asarray(y2im))
    bre, bim = stockham_fft_nb(y3re, y3im, inverse=True)
    assert np.max(np.abs(np.asarray(bre) - np.asarray(a3))) < 1e-5


def test_native_3d_layout_rejects_bad_shapes():
    with pytest.raises(ValueError):
        stockham_fft_nb(np.zeros((16, 4, 256), np.float32),
                        np.zeros((16, 4, 256), np.float32))
    with pytest.raises(ValueError):  # n beyond the 3D cap
        stockham_fft_nb(np.zeros((4096, 8, 256), np.float32),
                        np.zeros((4096, 8, 256), np.float32))
    with pytest.raises(ValueError):  # W not lane-aligned
        stockham_fft_nb(np.zeros((16, 8, 100), np.float32),
                        np.zeros((16, 8, 100), np.float32))


@pytest.mark.parametrize("n", [64, 1024])
def test_bf16_compute_tier(n, monkeypatch):
    """bf16 COMPUTE tier (round-3 headroom d, config.BF16_COMPUTE): the
    butterflies themselves run in bfloat16 (bf16 twiddle pack, weak-typed
    codelet scalars). Accuracy degrades to ~1e-2 — the documented
    speed/precision trade — and the roundtrip must still reconstruct to
    bf16-resolution."""
    from watfft_tpu import config
    monkeypatch.setattr(config, "BF16_COMPUTE", True)
    rng = ref.seeded_rng(n + 3)
    b = 128
    xre = rng.uniform(-1, 1, (n, b)).astype(np.float32)
    xim = rng.uniform(-1, 1, (n, b)).astype(np.float32)
    yre, yim = stockham_fft_nb(jnp.asarray(xre, jnp.bfloat16),
                               jnp.asarray(xim, jnp.bfloat16))
    assert yre.dtype == jnp.bfloat16
    got = (np.asarray(yre.astype(jnp.float32))
           + 1j * np.asarray(yim.astype(jnp.float32)))
    expected = ref.dft(xre.T + 1j * xim.T).T
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    assert err < 5e-2, err
    bre, bim = stockham_fft_nb(yre, yim, inverse=True)
    back = np.asarray(bre.astype(jnp.float32))
    assert np.max(np.abs(back - xre)) < 1e-1


def test_bf16_compute_tier_wide_batch(monkeypatch):
    """ADVICE r3 #4: the wide-batch case (n=64, b=2048) that would take the
    use3d path under f32. Under bf16c the 3D sublane fold violates Mosaic's
    (16, 128) bf16 tiling and fails to compile ON CHIP (Exp 42), so
    _stockham_call must force the 2D path — this covers that dispatch
    branch end-to-end (interpret mode here; bench.py runs it on chip)."""
    from watfft_tpu import config
    monkeypatch.setattr(config, "BF16_COMPUTE", True)
    rng = ref.seeded_rng(99)
    n, b = 64, 2048
    xre = rng.uniform(-1, 1, (n, b)).astype(np.float32)
    xim = rng.uniform(-1, 1, (n, b)).astype(np.float32)
    yre, yim = stockham_fft_nb(jnp.asarray(xre, jnp.bfloat16),
                               jnp.asarray(xim, jnp.bfloat16))
    assert yre.dtype == jnp.bfloat16
    got = (np.asarray(yre.astype(jnp.float32))
           + 1j * np.asarray(yim.astype(jnp.float32)))
    expected = ref.dft(xre.T + 1j * xim.T).T
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    assert err < 5e-2, err
