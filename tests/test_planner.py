"""Planner dispatch tests: the public API must run the fastest kernel.

Reference analog: the in-module auto dispatch (fft_combined.wat:727-732) and
the codelet table (fft_real_f32_dual.wat:2433-2459) — wat-fft's public entry
points always run the best implementation for the size. Here the planner
(watfft_tpu/planner.py) picks Pallas vs four-step per (n, dtype, backend);
these tests pin the decision table and drive the dispatched branches in
interpret mode on CPU (WATFFT_INTERPRET path), including the batch-major
transpose wrappers and the custom VJP that keeps the Pallas path
differentiable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from watfft_tpu import api, config, planner


@pytest.fixture
def interpret_mode(monkeypatch):
    """Force the Pallas branch on the CPU backend (interpret mode)."""
    monkeypatch.setattr(config, "FORCE_INTERPRET", True)
    yield


def test_decision_table_cpu():
    # On a plain CPU backend (no interpret override) the planner picks the
    # platform's native XLA FFT — the round-5 CPU bench measured the
    # four-step matmul path at 0.18-0.24x jnp.fft there, so dispatching
    # jnp.fft through the public API is the FFTW-planner answer (the
    # second-runtime story becomes "switching costs nothing off-TPU").
    assert planner.native_backend_fft()
    assert planner.c2c_kernel(1024, "float32") == "xla-fft"
    assert planner.r2c_kernel(1024, "float32") == "xla-fft"
    assert planner.c2c_kernel(1024, "float64") == "xla-fft"


def test_xla_fft_dispatch_matches_oracle():
    """The 'xla-fft' route through the public plane APIs (both contexts,
    both directions) computes the same transform as the f64 oracle —
    the second-runtime counterpart of the dispatched-kernel tests."""
    rng = np.random.default_rng(9)
    n = 256
    xre = rng.uniform(-1, 1, (4, n)).astype(np.float32)
    xim = rng.uniform(-1, 1, (4, n)).astype(np.float32)
    ctx = api.FFTContext(n, "float32")
    re, im = ctx.forward_planes(xre, xim)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.fft(xre.astype(np.float64) + 1j * xim.astype(np.float64))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-6
    br, bi = ctx.inverse_planes(re, im)
    assert np.max(np.abs(np.asarray(br) - xre)) < 1e-6

    rctx = api.RFFTContext(n, "float32")
    s = rng.uniform(-1, 1, (4, n)).astype(np.float32)
    sre, sim = rctx.forward_planes(s)
    gs = np.asarray(sre) + 1j * np.asarray(sim)
    rs = np.fft.rfft(s.astype(np.float64))
    assert np.max(np.abs(gs - rs)) / np.max(np.abs(rs)) < 1e-6
    back = rctx.inverse_planes(sre, sim)
    assert np.max(np.abs(np.asarray(back) - s)) < 1e-6


def test_decision_table_pallas(interpret_mode):
    assert planner.c2c_kernel(16, "float32") == "stockham"
    assert planner.c2c_kernel(4096, "float32") == "stockham"
    # round-3 crossover (config.py table): the cube four-step overtakes the
    # single kernel from 2^13 — 2.59x vs 2.13x at 8192, 2.22x vs 1.14x at
    # 16384 (valley probe)
    assert planner.c2c_kernel(8192, "float32") == "large-nb"
    assert planner.c2c_kernel(16384, "float32") == "large-nb"
    assert planner.c2c_kernel(32768, "float32") == "large-nb"
    assert planner.c2c_kernel(1 << 20, "float32") == "large-nb"
    # beyond 2^20 the fused stage-2 kernel's VMEM live set cannot compile
    # (ADVICE r2): unknown/large batches fall back to the XLA four-step...
    assert planner.c2c_kernel(1 << 21, "float32") == "fourstep"
    assert planner.c2c_kernel(1 << 21, "float32", batch=128) == "fourstep"
    # ...but single/small-batch transforms ride the 2D tiled-twiddle
    # four-step through 2^22 (1.27x/1.78x on chip vs jnp; fourstep ties)
    assert planner.c2c_kernel(1 << 21, "float32", batch=1) == "large-nb"
    assert planner.c2c_kernel(1 << 22, "float32", batch=1) == "large-nb"
    assert planner.c2c_kernel(1 << 22, "float32", batch=4) == "fourstep"  # tw cap
    assert planner.c2c_kernel(1 << 23, "float32", batch=1) == "fourstep"
    assert planner.c2c_kernel(1024, "float64") == "fourstep"   # f64 tier is separate
    # real path: per-size, PER-DIRECTION codelet table (Exp 32/35, re-probed
    # in Exp 41 after the Exp 39 radix replans, and again in Exp 47 after
    # the bf16x3 mirror made the fused kernels ~2x cheaper — the fused
    # FORWARD now wins at 16-512 and 2048-8192 (1024 stays hybrid); the
    # fused INVERSE wins for the first time at 1024, hybrid elsewhere)
    assert planner.r2c_kernel(64, "float32") == "rfft-pallas-fused"
    assert planner.r2c_kernel(128, "float32", "forward") == "rfft-pallas-fused"
    assert planner.r2c_kernel(256, "float32") == "rfft-pallas-fused"
    assert planner.r2c_kernel(512, "float32", "forward") == "rfft-pallas-fused"
    assert planner.r2c_kernel(2048, "float32", "forward") == "rfft-pallas-fused"
    assert planner.r2c_kernel(4096, "float32", "forward") == "rfft-pallas-fused"
    assert planner.r2c_kernel(8192, "float32", "forward") == "rfft-pallas-fused"
    assert planner.r2c_kernel(1024, "float32", "forward") == "rfft-pallas"
    assert planner.r2c_kernel(64, "float32", "inverse") == "rfft-pallas"
    assert planner.r2c_kernel(256, "float32", "inverse") == "rfft-pallas"
    assert planner.r2c_kernel(1024, "float32", "inverse") == "rfft-pallas-fused"
    assert planner.r2c_kernel(4096, "float32", "inverse") == "rfft-pallas"
    assert planner.r2c_kernel(16384, "float32", "forward") == "rfft-pallas"
    assert planner.r2c_kernel(4, "float32") == "fourstep"      # below kernel range
    # past the Stockham ceiling the real path rides the batched four-step
    assert planner.r2c_kernel(32768, "float32") == "rfft-large"
    assert planner.r2c_kernel(1 << 21, "float32") == "rfft-large"
    assert planner.r2c_kernel(1 << 22, "float32") == "fourstep"
    assert planner.r2c_kernel(1024, "float64") == "fourstep"


@pytest.mark.parametrize("n,batch", [(64, 5), (256, 128), (1024, 1)])
def test_dispatched_complex_forward_inverse(interpret_mode, n, batch):
    """forward_planes routes through the Pallas kernel (batch-major wrapper:
    transpose + lane pad) and still matches numpy, any batch size."""
    rng = np.random.default_rng(n)
    shape = (batch, n) if batch > 1 else (n,)
    xre = rng.uniform(-1, 1, shape).astype(np.float32)
    xim = rng.uniform(-1, 1, shape).astype(np.float32)
    ctx = api.FFTContext(n, "float32")
    re, im = ctx.forward_planes(xre, xim)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.fft(xre.astype(np.float64) + 1j * xim.astype(np.float64))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6
    rre, rim = ctx.inverse_planes(re, im)
    assert np.max(np.abs(np.asarray(rre) - xre)) < 1e-5


@pytest.mark.parametrize("n,batch", [(64, 3), (512, 128)])
def test_dispatched_real_roundtrip(interpret_mode, n, batch):
    rng = np.random.default_rng(n)
    x = rng.uniform(-1, 1, (batch, n)).astype(np.float32)
    ctx = api.RFFTContext(n, "float32")
    re, im = ctx.forward_planes(x)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.rfft(x.astype(np.float64))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6
    back = np.asarray(ctx.inverse_planes(re, im))
    assert np.max(np.abs(back - x)) < 1e-5


def test_fourstep_surface_still_explicit(interpret_mode):
    """The explicit four-step methods bypass dispatch (registry pins them)."""
    rng = np.random.default_rng(7)
    n = 64
    xre = rng.uniform(-1, 1, (4, n)).astype(np.float32)
    xim = rng.uniform(-1, 1, (4, n)).astype(np.float32)
    ctx = api.FFTContext(n, "float32")
    re, im = ctx.forward_planes_fourstep(xre, xim)
    ref = np.fft.fft(xre.astype(np.float64) + 1j * xim.astype(np.float64))
    got = np.asarray(re) + 1j * np.asarray(im)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6


def test_stockham_custom_vjp(interpret_mode):
    """grad through the Pallas kernel equals grad through the XLA four-step
    (the custom VJP is the conjugate transform)."""
    from watfft_tpu.ops.pallas_stockham import stockham_fft_nb
    from watfft_tpu.ops.fourstep import fft_planes

    rng = np.random.default_rng(3)
    n, b = 32, 128
    xre = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))

    def loss_pallas(a, bb):
        re, im = stockham_fft_nb(a, bb)
        return jnp.sum(re * re + 2.0 * im * im)

    def loss_xla(a, bb):
        re, im = fft_planes(a.T, bb.T)
        return jnp.sum(re * re + 2.0 * im * im)

    # grads are wrt the SAME time-major arrays in both losses (the .T in
    # loss_xla is inside the function), so no transpose on comparison
    gp = jax.grad(loss_pallas, argnums=(0, 1))(xre, xim)
    gx = jax.grad(loss_xla, argnums=(0, 1))(xre, xim)
    for p, x in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(x),
                                   rtol=2e-4, atol=2e-3)

    # inverse direction too
    def loss_pallas_inv(a, bb):
        re, im = stockham_fft_nb(a, bb, inverse=True)
        return jnp.sum(re * im)

    def loss_xla_inv(a, bb):
        re, im = fft_planes(a.T, bb.T, inverse=True)
        return jnp.sum(re * im)

    gp = jax.grad(loss_pallas_inv, argnums=(0, 1))(xre, xim)
    gx = jax.grad(loss_xla_inv, argnums=(0, 1))(xre, xim)
    for p, x in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(x),
                                   rtol=2e-4, atol=2e-3)


def test_one_shot_fft_dispatches(interpret_mode):
    """api.fft (the user-facing one-shot) runs the dispatched path."""
    rng = np.random.default_rng(11)
    x = (rng.uniform(-1, 1, (4, 128)) + 1j * rng.uniform(-1, 1, (4, 128)))
    got = np.asarray(api.fft(x.astype(np.complex64)))
    ref = np.fft.fft(x)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6
