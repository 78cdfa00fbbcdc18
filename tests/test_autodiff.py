"""Autodiff coverage for the Pallas paths (custom VJPs).

pallas_call has no autodiff rule; the kernels carry custom VJPs whose
adjoints reuse the kernels themselves (the transforms are linear maps):
complex: VJP(fft) = n * ifft (pallas_stockham.py); real: see the derivation
in pallas_rfft.py. Two verification levels:

1. grad through a loss vs the same loss built on jnp.fft (end-to-end).
2. cotangent-exactness vs jax.grad of an XLA-composed mimic of OUR exact
   linear map (including how irfft reads the imag DC/Nyquist rows, which
   jnp.fft.irfft ignores) — the jacobian-transpose gold standard.

New capability vs the reference (WASM kernels have no autodiff).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from watfft_tpu.ops.pallas_stockham import stockham_fft_nb
from watfft_tpu.ops.pallas_rfft import rfft_nb, irfft_nb

ATOL = 1e-3


def _weights(rows):
    return jnp.asarray((np.arange(rows) % 7 + 1).astype(np.float32).reshape(-1, 1))


def _irfft_mimic(a, b):
    """XLA re-statement of _irfft_impl's exact linear map (same pre-process,
    jnp.fft.ifft core — normalized like ours), for jacobian-transpose checks."""
    m = a.shape[0] - 1
    n = 2 * m
    k = np.arange(m)
    w = np.exp(+1j * np.pi * k / m).reshape(-1, 1)
    A = (a + 1j * b)[:m]
    B = jnp.concatenate([a[m:m + 1], jnp.flip(a[1:m], axis=0)], axis=0) \
        - 1j * jnp.concatenate([b[m:m + 1], jnp.flip(b[1:m], axis=0)], axis=0)
    E = 0.5 * (A + B)
    O = 0.5j * (A - B)
    Z = E + jnp.asarray(w) * O
    z = jnp.fft.ifft(Z, axis=0)
    return jnp.stack([z.real, z.imag], axis=1).reshape(n, a.shape[-1])


@pytest.mark.parametrize("n", [16, 64, 256])
def test_grad_complex_matches_jnp(n):
    rng = np.random.default_rng(5)
    xre = jnp.asarray(rng.uniform(-1, 1, (n, 128)).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, (n, 128)).astype(np.float32))
    w = _weights(n)

    def loss_ours(a, b):
        re, im = stockham_fft_nb(a, b)
        return jnp.sum(w * (re * re + im * im))

    def loss_jnp(a, b):
        z = jnp.fft.fft((a + 1j * b).T).T
        return jnp.sum(w * (z.real ** 2 + z.imag ** 2))

    gre, gim = jax.grad(loss_ours, argnums=(0, 1))(xre, xim)
    rre, rim = jax.grad(loss_jnp, argnums=(0, 1))(xre, xim)
    np.testing.assert_allclose(np.asarray(gre), np.asarray(rre),
                               atol=ATOL * n, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gim), np.asarray(rim),
                               atol=ATOL * n, rtol=1e-4)


@pytest.mark.parametrize("n", [16, 64, 256])
def test_grad_rfft_matches_jnp(n):
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(-1, 1, (n, 128)).astype(np.float32))
    w = _weights(n // 2 + 1)

    def loss_ours(a):
        re, im = rfft_nb(a)
        return jnp.sum(w * (re * re + im * im))

    def loss_jnp(a):
        z = jnp.fft.rfft(a.T).T
        return jnp.sum(w * (z.real ** 2 + z.imag ** 2))

    g = jax.grad(loss_ours)(x)
    r = jax.grad(loss_jnp)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                               atol=ATOL * n, rtol=1e-4)


@pytest.mark.parametrize("n", [16, 64, 256])
def test_grad_irfft_exact_vs_mimic(n):
    """Full-jacobian check (all rows, including the imag DC/Nyquist rows our
    map reads): jax.grad through the XLA mimic of the exact same map."""
    rng = np.random.default_rng(7)
    m = n // 2
    xre = jnp.asarray(rng.uniform(-1, 1, (m + 1, 128)).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, (m + 1, 128)).astype(np.float32))
    w = _weights(n)

    # maps agree on arbitrary (non-Hermitian-consistent) inputs
    np.testing.assert_allclose(np.asarray(irfft_nb(xre, xim)),
                               np.asarray(_irfft_mimic(xre, xim)),
                               atol=1e-4)

    def loss_ours(a, b):
        y = irfft_nb(a, b)
        return jnp.sum(w * y * y)

    def loss_mimic(a, b):
        y = _irfft_mimic(a, b)
        return jnp.sum(w * y * y)

    gre, gim = jax.grad(loss_ours, argnums=(0, 1))(xre, xim)
    rre, rim = jax.grad(loss_mimic, argnums=(0, 1))(xre, xim)
    np.testing.assert_allclose(np.asarray(gre), np.asarray(rre),
                               atol=ATOL, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gim), np.asarray(rim),
                               atol=ATOL, rtol=1e-3)


@pytest.mark.parametrize("n", [16, 64])
def test_grad_rfft_fused_matches_jnp(n):
    """The single-pass fused kernel's VJP (same adjoint identities realized
    on the fused kernels) agrees with jnp's grad."""
    from watfft_tpu.ops.pallas_rfft import rfft_nb_fused
    rng = np.random.default_rng(16)
    x = jnp.asarray(rng.uniform(-1, 1, (n, 128)).astype(np.float32))
    w = _weights(n // 2 + 1)

    def loss_ours(a):
        re, im = rfft_nb_fused(a)
        return jnp.sum(w * (re * re + im * im))

    def loss_jnp(a):
        z = jnp.fft.rfft(a.T).T
        return jnp.sum(w * (z.real ** 2 + z.imag ** 2))

    g = jax.grad(loss_ours)(x)
    r = jax.grad(loss_jnp)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                               atol=ATOL * n, rtol=1e-4)


@pytest.mark.parametrize("n", [16, 64])
def test_grad_irfft_fused_matches_hybrid(n):
    """Fused and hybrid inverse kernels realize the same map, so their grads
    must agree on arbitrary (non-Hermitian-consistent) inputs too."""
    from watfft_tpu.ops.pallas_rfft import irfft_nb_fused
    rng = np.random.default_rng(17)
    m = n // 2
    xre = jnp.asarray(rng.uniform(-1, 1, (m + 1, 128)).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, (m + 1, 128)).astype(np.float32))
    w = _weights(n)

    np.testing.assert_allclose(np.asarray(irfft_nb_fused(xre, xim)),
                               np.asarray(irfft_nb(xre, xim)), atol=1e-4)

    def loss_fused(a, b):
        y = irfft_nb_fused(a, b)
        return jnp.sum(w * y * y)

    def loss_hybrid(a, b):
        y = irfft_nb(a, b)
        return jnp.sum(w * y * y)

    gf = jax.grad(loss_fused, argnums=(0, 1))(xre, xim)
    gh = jax.grad(loss_hybrid, argnums=(0, 1))(xre, xim)
    for a, b in zip(gf, gh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=ATOL, rtol=1e-3)


def test_grad_roundtrip_is_identityish():
    """grad of 0.5*||irfft(rfft(x))||^2 is x itself (roundtrip = identity)."""
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(-1, 1, (64, 128)).astype(np.float32))

    def loss(a):
        re, im = rfft_nb(a)
        y = irfft_nb(re, im)
        return 0.5 * jnp.sum(y * y)

    g = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(x), atol=1e-3)


def test_grad_rfft2_matches_jnp():
    """The fused 2D real path (Exp 50) is differentiable end-to-end: the
    recombinations are plain jnp and fft2_nb carries a custom VJP. Gradient
    of sum|rfft2(x)|^2 must match the jnp.fft.rfft2 reference program."""
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 32)).astype(np.float32))
    from watfft_tpu.ops.fft2 import rfft2_planes, irfft2_planes

    def loss_ours(a):
        re, im = rfft2_planes(a)
        return jnp.sum(re * re + im * im)

    def loss_jnp(a):
        z = jnp.fft.rfft2(a)
        return jnp.sum(jnp.real(z) ** 2 + jnp.imag(z) ** 2)

    g = jax.grad(loss_ours)(x)
    gj = jax.grad(loss_jnp)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gj),
                               atol=1e-2, rtol=1e-3)

    def loss_rt(a):
        re, im = rfft2_planes(a)
        y = irfft2_planes(re, im)
        return 0.5 * jnp.sum(y * y)

    g2 = jax.grad(loss_rt)(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(x), atol=1e-3)
