"""2D FFT (single-chip) and large-N four-step tests."""

import numpy as np
import pytest

from watfft_tpu.ops.fft2 import fft2_planes
from watfft_tpu.ops.large import fft_large, large_split
from watfft_tpu.reference import dft as ref


@pytest.mark.parametrize("h,w", [(128, 128), (256, 128)])
def test_fft2_matches_reference(h, w):
    rng = ref.seeded_rng(h + w)
    x = rng.uniform(-1, 1, (h, w)) + 1j * rng.uniform(-1, 1, (h, w))
    re, im = fft2_planes(x.real.astype(np.float32), x.imag.astype(np.float32))
    got = np.asarray(re) + 1j * np.asarray(im)
    expected = ref.dft2(x)
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    assert err < 5e-6, err


@pytest.mark.parametrize("shape", [(8, 8), (4, 16, 32), (2, 64, 256),
                                   (128, 128), (3, 8, 4)])
def test_rfft2_matches_numpy(shape):
    """Fused 2D real path (pack-as-complex + half-width fft2 + 2D Hermitian
    recombination, ops/fft2.rfft2_planes) vs the f64 numpy oracle —
    including batched, tall, and tiny-w shapes across both the fused-kernel
    and the portable dispatch."""
    from watfft_tpu.ops.fft2 import rfft2_planes, irfft2_planes
    rng = ref.seeded_rng(sum(shape))
    x = rng.uniform(-1, 1, shape).astype(np.float32)
    re, im = rfft2_planes(x)
    got = np.asarray(re) + 1j * np.asarray(im)
    expected = np.fft.rfft2(x.astype(np.float64))
    assert got.shape == expected.shape
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    assert err < 5e-6, err
    back = np.asarray(irfft2_planes(re, im))
    assert np.max(np.abs(back - x)) < 1e-5


def test_rfft2_matches_composed_column_path():
    """The fused 2D recombination must agree with the independent
    composition (1D rfft rows + complex fft columns) that the sharded
    faces use — two different derivations of the same transform."""
    import jax.numpy as jnp
    from watfft_tpu.ops.fft2 import rfft2_planes
    from watfft_tpu.parallel.sharded import _local_rfft, _local_fft
    rng = ref.seeded_rng(77)
    x = rng.uniform(-1, 1, (2, 64, 128)).astype(np.float32)
    re, im = rfft2_planes(x)
    cre, cim = _local_rfft(jnp.asarray(x))
    cre = jnp.swapaxes(cre, -1, -2)
    cim = jnp.swapaxes(cim, -1, -2)
    cre, cim = _local_fft(cre, cim, False)
    cre = jnp.swapaxes(cre, -1, -2)
    cim = jnp.swapaxes(cim, -1, -2)
    scale = np.max(np.abs(np.asarray(cre)))
    assert np.max(np.abs(np.asarray(re) - np.asarray(cre))) / scale < 5e-6
    assert np.max(np.abs(np.asarray(im) - np.asarray(cim))) / scale < 5e-6


@pytest.mark.parametrize("shape", [(256, 256), (1, 128, 512), (2, 64, 256)])
def test_fft2_thin_batch_kernel_path(shape, monkeypatch):
    """Exp 52: thin batches (b % 128 != 0, incl. BASELINE config 5's single
    image) dispatch to the in-VMEM-transpose row kernel instead of paying
    two boundary transposes. Forced interpret so the kernel path (not the
    portable fallback) is what runs on CPU."""
    import jax.numpy as jnp
    from watfft_tpu import config
    from watfft_tpu.ops import fft2 as f2
    monkeypatch.setattr(config, "FORCE_INTERPRET", True)
    lead = 1
    for s in shape[:-2]:
        lead *= s
    assert f2._fft2_thin_ok(shape[-2], shape[-1], lead)
    rng = ref.seeded_rng(sum(shape))
    a = rng.uniform(-1, 1, shape).astype(np.float32)
    b = rng.uniform(-1, 1, shape).astype(np.float32)
    re, im = f2.fft2_planes(jnp.asarray(a), jnp.asarray(b))
    expected = np.fft.fft2(a.astype(np.float64) + 1j * b.astype(np.float64))
    got = np.asarray(re) + 1j * np.asarray(im)
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    assert err < 5e-6, err
    bre, bim = f2.fft2_planes(re, im, inverse=True)
    assert np.max(np.abs(np.asarray(bre) - a)) < 1e-4
    assert np.max(np.abs(np.asarray(bim) - b)) < 1e-4


def test_fft2_thin_batch_grad(monkeypatch):
    """The thin-path row kernel carries a custom VJP (conjugate transform):
    grad of sum|fft2(z)|^2 must equal the analytic 2*h*w*x (Parseval)."""
    import jax
    import jax.numpy as jnp
    from watfft_tpu import config
    from watfft_tpu.ops.fft2 import fft2_planes
    monkeypatch.setattr(config, "FORCE_INTERPRET", True)
    rng = ref.seeded_rng(52)
    x = jnp.asarray(rng.uniform(-1, 1, (128, 128)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (128, 128)).astype(np.float32))

    def loss(p, q):
        r, i = fft2_planes(p, q)
        return jnp.sum(r * r + i * i)

    gx, gy = jax.grad(loss, argnums=(0, 1))(x, y)
    # rtol alone misses near-zero x entries whose absolute f32 error is set
    # by the transform scale (2*h*w), hence the scale-relative atol
    np.testing.assert_allclose(np.asarray(gx), 2 * 128 * 128 * np.asarray(x),
                               rtol=1e-4, atol=2 * 128 * 128 * 2e-6)
    np.testing.assert_allclose(np.asarray(gy), 2 * 128 * 128 * np.asarray(y),
                               rtol=1e-4, atol=2 * 128 * 128 * 2e-6)


def test_rfft2_rejects_bad_shapes():
    from watfft_tpu.ops.fft2 import rfft2_planes
    with pytest.raises(ValueError, match="power of two"):
        rfft2_planes(np.zeros((8, 12), np.float32))
    with pytest.raises(ValueError, match="w >= 4"):
        rfft2_planes(np.zeros((8, 2), np.float32))
    with pytest.raises(ValueError, match="2 trailing axes"):
        rfft2_planes(np.zeros((8,), np.float32))


def test_fft2_batched_roundtrip():
    rng = ref.seeded_rng(3)
    x = rng.uniform(-1, 1, (2, 128, 128)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 128, 128)).astype(np.float32)
    re, im = fft2_planes(x, y)
    bre, bim = fft2_planes(re, im, inverse=True)
    assert np.max(np.abs(np.asarray(bre) - x)) < 1e-4
    assert np.max(np.abs(np.asarray(bim) - y)) < 1e-4


def test_large_split_factors():
    # round-3 domain: n1 (outer) >= 128 always; n2 (inner) may drop to 64
    # at the new 2^13 lower bound; odd logs put the smaller factor outer
    # (measured: (128, 256) beats (256, 128) at 32768)
    for log in range(13, 21):
        n1, n2 = large_split(1 << log)
        assert n1 * n2 == 1 << log
        assert 128 <= n1 <= 4096 and 64 <= n2 <= 4096
        assert n1 <= n2 or log == 13


@pytest.mark.parametrize("log", [14, 16])
def test_fft_large_matches_fftpack(log):
    n = 1 << log
    rng = ref.seeded_rng(log)
    x = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
    re, im = fft_large(x.real.astype(np.float32), x.imag.astype(np.float32))
    got = np.asarray(re) + 1j * np.asarray(im)
    expected = np.fft.fft(x)  # O(n log n) reference is fine at f64
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    assert err < 5e-6, err


def test_fft_large_native_inverse():
    n = 1 << 14
    rng = ref.seeded_rng(99)
    xr = rng.uniform(-1, 1, n).astype(np.float32)
    xi = rng.uniform(-1, 1, n).astype(np.float32)
    re, im = fft_large(xr, xi)
    br, bi = fft_large(np.asarray(re), np.asarray(im), inverse=True)
    assert np.max(np.abs(np.asarray(br) - xr)) < 1e-4
    assert np.max(np.abs(np.asarray(bi) - xi)) < 1e-4


def test_fft_large_rejects_small():
    with pytest.raises(ValueError):
        fft_large(np.zeros(4096, np.float32), np.zeros(4096, np.float32))


def test_postmul_kernel_matches_separate_multiply():
    """stockham_fft_nb_postmul == fft followed by elementwise complex mul."""
    import jax.numpy as jnp
    from watfft_tpu.ops.pallas_stockham import (
        stockham_fft_nb, stockham_fft_nb_postmul)
    rng = ref.seeded_rng(7)
    n, b = 256, 128
    xre = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    pre = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    pim = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    fre, fim = stockham_fft_nb(xre, xim)
    expected_re = fre * pre - fim * pim
    expected_im = fre * pim + fim * pre
    gre, gim = stockham_fft_nb_postmul(xre, xim, pre, pim)
    assert np.max(np.abs(np.asarray(gre) - np.asarray(expected_re))) < 1e-3
    assert np.max(np.abs(np.asarray(gim) - np.asarray(expected_im))) < 1e-3


def test_tiled_twiddle_cache_matches_repeat():
    """_TwCacheTiled repeats each four-step twiddle column across the
    in-column transform batch (the fft_large_nb layout)."""
    from watfft_tpu.ops.large import _TwCache, _TwCacheTiled
    n, n1, n2, b = 1 << 14, 128, 128, 4
    twre, twim = _TwCache.get(n, n1, n2, False)
    tre, tim = _TwCacheTiled.get(n, n1, n2, b, False)
    assert tre.shape == (n2, n1 * b)
    assert np.array_equal(tre, np.repeat(twre, b, axis=1))
    assert np.array_equal(tim, np.repeat(twim, b, axis=1))


@pytest.mark.parametrize("batch", [1, 2, 128])
def test_fft_large_nb_matches_fftpack(batch):
    # batch=128 exercises the FUSED second-stage path (Exp 27); smaller
    # batches the tiled-pm + XLA-transpose path
    from watfft_tpu.ops.large import fft_large_nb
    n = 1 << 14
    rng = ref.seeded_rng(batch)
    x = rng.uniform(-1, 1, (batch, n)) + 1j * rng.uniform(-1, 1, (batch, n))
    xre = np.ascontiguousarray(x.real.T).astype(np.float32)
    xim = np.ascontiguousarray(x.imag.T).astype(np.float32)
    re, im = fft_large_nb(xre, xim)
    got = np.asarray(re).T + 1j * np.asarray(im).T
    expected = np.fft.fft(x, axis=-1)
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    assert err < 5e-6, err
    bre, bim = fft_large_nb(np.asarray(re), np.asarray(im), inverse=True)
    assert np.max(np.abs(np.asarray(bre).T - x.real)) < 1e-4
    assert np.max(np.abs(np.asarray(bim).T - x.imag)) < 1e-4


@pytest.mark.parametrize("mode,n,split", [
    ("cube", 1 << 13, (128, 64)),    # round-3 dispatch winner at 8192
    ("cube", 1 << 14, (128, 128)),   # dispatch winner at 16384
    ("pipe2", 1 << 13, (128, 64)),   # fully-3D two-kernel pipeline
    ("pipe2", 1 << 15, (128, 256)),  # dispatch winner at 32768
])
def test_fft_large_nb_modes(mode, n, split):
    """Both four-step modes (single-kernel cube at the 4-HBM-pass floor;
    fully-3D two-kernel pipe2 at 8 passes) against numpy, explicit splits
    matching the round-3 dispatch table."""
    from watfft_tpu.ops.large import fft_large_nb
    rng = ref.seeded_rng(n % 97)
    b = 128
    x = rng.uniform(-1, 1, (b, n)) + 1j * rng.uniform(-1, 1, (b, n))
    xre = np.ascontiguousarray(x.real.T).astype(np.float32)
    xim = np.ascontiguousarray(x.imag.T).astype(np.float32)
    re, im = fft_large_nb(xre, xim, split=split, mode=mode)
    got = np.asarray(re).T + 1j * np.asarray(im).T
    expected = np.fft.fft(x, axis=-1)
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    assert err < 5e-6, err
    bre, bim = fft_large_nb(np.asarray(re), np.asarray(im), inverse=True,
                            split=split, mode=mode)
    assert np.max(np.abs(np.asarray(bre).T - x.real)) < 1e-4
    assert np.max(np.abs(np.asarray(bim).T - x.imag)) < 1e-4


def test_fft_large_nb_rejects_bad_shapes():
    from watfft_tpu.ops.large import fft_large_nb
    with pytest.raises(ValueError):
        fft_large_nb(np.zeros((4096, 1), np.float32),
                     np.zeros((4096, 1), np.float32))
    with pytest.raises(ValueError):
        fft_large_nb(np.zeros((1 << 14, 3), np.float32),
                     np.zeros((1 << 14, 3), np.float32))


@pytest.mark.parametrize("batch", [2, 128])
def test_rfft_large_nb_matches_numpy(batch):
    """Large-N real path (pack-as-complex on the batched four-step):
    forward vs numpy's rfft in f64, and roundtrip identity."""
    from watfft_tpu.ops.large import rfft_large_nb, irfft_large_nb
    n = 1 << 14
    rng = ref.seeded_rng(3 + batch)
    x = rng.uniform(-1, 1, (batch, n))
    xt = np.ascontiguousarray(x.T).astype(np.float32)
    re, im = rfft_large_nb(xt)
    got = np.asarray(re).T + 1j * np.asarray(im).T
    expected = np.fft.rfft(x, axis=-1)
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    assert err < 5e-6, err
    back = np.asarray(irfft_large_nb(np.asarray(re), np.asarray(im)))
    assert np.max(np.abs(back.T - x)) < 1e-4


def test_rfft_large_nb_grad_matches_jnp():
    """Custom VJP of the large real path agrees with jnp's rfft grad."""
    import jax
    import jax.numpy as jnp
    from watfft_tpu.ops.large import rfft_large_nb
    n, b = 1 << 14, 2
    rng = ref.seeded_rng(11)
    x = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.5, 1.5, (n // 2 + 1, 1)).astype(np.float32))

    def loss_ours(a):
        re, im = rfft_large_nb(a)
        return jnp.sum(w * (re * re + im * im))

    def loss_jnp(a):
        z = jnp.fft.rfft(a.T).T
        return jnp.sum(w * (z.real ** 2 + z.imag ** 2))

    g = jax.grad(loss_ours)(x)
    r = jax.grad(loss_jnp)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                               atol=2e-2, rtol=1e-4)
