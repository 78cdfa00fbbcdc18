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


@pytest.mark.parametrize("n", [16, 128, 512, 2048])
def test_mxu_select_real_path(n, monkeypatch):
    """Exp 47: the MXU selection-dot deinterleave/reinterleave (blocked
    0/1 matmuls; exact 3-pass bf16x3 on chip, HIGHEST under interpret)
    must match the parity-view select on both the hybrid cores and the
    fused kernels, both directions."""
    import jax.numpy as jnp
    from watfft_tpu import config
    from watfft_tpu.ops import pallas_rfft as pr
    rng = ref.seeded_rng(n)
    m = n // 2
    x = jnp.asarray(rng.uniform(-1, 1, (n, 128)).astype(np.float32))
    sre = jnp.asarray(rng.uniform(-1, 1, (m + 1, 128)).astype(np.float32))
    sim = jnp.asarray(rng.uniform(-1, 1, (m + 1, 128)).astype(np.float32))
    outs = {}
    for sel in (False, True):
        sizes = frozenset({n}) if sel else frozenset()
        monkeypatch.setattr(config, "RFFT_MXU_SELECT_FWD_SIZES", sizes)
        monkeypatch.setattr(config, "RFFT_MXU_SELECT_INV_SIZES", sizes)
        outs[sel] = (*pr._rfft_impl(x), pr._irfft_impl(sre, sim),
                     *pr._rfft_fused_impl(x),
                     pr._irfft_fused_impl(sre, sim))
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
    expected = np.fft.rfft(np.asarray(x, np.float64), axis=0)
    got = np.asarray(outs[True][0]) + 1j * np.asarray(outs[True][1])
    assert np.max(np.abs(got - expected)) / np.max(np.abs(expected)) < 5e-6


def test_mxu_select_dots_exact():
    """The selection dots themselves are bit-exact against the strided
    select / stack merge (both the compiled bf16x3 form and the
    interpret-mode HIGHEST form -- the bf16x3 split summed hi->mid->lo
    reconstructs every f32 bit pattern)."""
    import jax
    import jax.numpy as jnp
    from watfft_tpu.ops import pallas_rfft as pr
    rng = ref.seeded_rng(47)
    for m, scale in ((64, 1.0), (128, 3.7e3), (1024, 1e-6)):
        n = 2 * m
        b = 128
        zre = jnp.asarray(rng.uniform(-1, 1, (m, b)).astype(np.float32)) * scale
        zim = jnp.asarray(rng.uniform(-1, 1, (m, b)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32)) * scale
        dm = jnp.asarray(pr._DCache.get(min(128, n)))
        dmt = jnp.asarray(pr._DCache.get(min(128, n), transpose=True))
        want_i = np.asarray(jnp.stack([zre, zim], axis=1).reshape(n, b))
        want_e = np.asarray(x).reshape(m, 2, b)
        for dot in (pr._sel_dot, pr._sel_dot_exact):
            got_i = np.asarray(jax.jit(pr._mxu_reint, static_argnums=3)(
                zre, zim, dmt, dot))
            de, do = jax.jit(pr._mxu_deint, static_argnums=2)(x, dm, dot)
            assert (got_i == want_i).all(), (m, dot)
            assert (np.asarray(de) == want_e[:, 0]).all(), (m, dot)
            assert (np.asarray(do) == want_e[:, 1]).all(), (m, dot)
