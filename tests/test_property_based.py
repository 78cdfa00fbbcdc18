"""Tier 3: property-based random testing (hypothesis = the fast-check analog).

Port of tests/property_based.test.js (reference): arbitrary bounded float
arrays at relaxed 1e-6-level tolerances, motivated by the historical rfft_32
bug that curated inputs masked (property_based.test.js:4-6).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from watfft_tpu import registry
from watfft_tpu.reference import dft as ref

# Round-4 breadth raise (VERDICT r3 Weak #8): sizes through 2048 — the
# (n,)-shaped transforms at 1024/2048 share compiles with the tier-1/2
# suites (test_fft_reference sweeps the same shapes to 4096), so the wider
# sweep costs examples, not interpret-mode compiles.
SIZES = [8, 32, 64, 128, 512, 1024, 2048]

finite = st.floats(min_value=-10, max_value=10, allow_nan=False,
                   allow_infinity=False, width=32)


@settings(max_examples=40, deadline=None)
@given(st.sampled_from(SIZES), st.integers(0, 2**31 - 1))
def test_complex_forward_matches_dft(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-10, 10, n) + 1j * rng.uniform(-10, 10, n)
    got = np.asarray(registry.flagship("complex-forward", "float32").make(n)(x),
                     np.complex128)
    expected = ref.dft(x)
    scale = max(np.max(np.abs(expected)), 1e-30)
    assert np.max(np.abs(got - expected)) / scale < 2e-6


@settings(max_examples=20, deadline=None)
@given(st.sampled_from(SIZES), st.lists(finite, min_size=8, max_size=8))
def test_real_roundtrip_random(n, head):
    rng = np.random.default_rng(abs(hash(tuple(head))) % (2**31))
    x = rng.uniform(-10, 10, n)
    x[: len(head)] = head[: min(len(head), n)]
    fwd = registry.flagship("real-forward", "float32").make(n)
    inv = registry.flagship("real-inverse", "float32").make(n)
    back = np.asarray(inv(fwd(x)), np.float64)
    assert np.max(np.abs(back - x)) < 2e-3  # inputs up to |10| => abs tol scaled


@settings(max_examples=25, deadline=None)
@given(st.sampled_from(SIZES), st.integers(0, 2**31 - 1))
def test_hermitian_symmetry_of_real_input(n, seed):
    """FFT of a real signal is Hermitian: X[N-k] == conj(X[k])."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-10, 10, n).astype(np.complex128)
    X = np.asarray(registry.flagship("complex-forward", "float32").make(n)(x),
                   np.complex128)
    mirrored = np.conj(np.concatenate([X[:1], X[1:][::-1]]))
    assert np.max(np.abs(X - mirrored)) < 5e-5 * max(np.max(np.abs(X)), 1.0)


@settings(max_examples=25, deadline=None)
@given(st.sampled_from(SIZES), st.integers(0, 2**31 - 1))
def test_conjugation_identity(n, seed):
    """FFT(conj(x)) == n * conj(IFFT(x)) — ties the independently-planned
    forward and inverse kernels (conjugated twiddle packs, folded 1/n)
    together on random inputs; a sign or scale slip in either table breaks
    it."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-10, 10, n) + 1j * rng.uniform(-10, 10, n)
    fwd = registry.flagship("complex-forward", "float32").make(n)
    inv = registry.flagship("complex-inverse", "float32").make(n)
    lhs = np.asarray(fwd(np.conj(x)), np.complex128)
    rhs = n * np.conj(np.asarray(inv(x), np.complex128))
    scale = max(np.max(np.abs(rhs)), 1e-30)
    assert np.max(np.abs(lhs - rhs)) / scale < 5e-6


@settings(max_examples=25, deadline=None)
@given(st.sampled_from(SIZES), st.integers(0, 2**31 - 1))
def test_rfft_consistent_with_complex_fft(n, seed):
    """Cross-surface consistency on random input: the real-forward surface
    (packed m=n/2 core + Hermitian post-process — entirely different
    machinery) must equal the first n/2+1 bins of the complex flagship.
    The reference's historical rfft_32 bins-9-15 bug was exactly a
    divergence of this kind that curated inputs masked."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-10, 10, n)
    R = np.asarray(registry.flagship("real-forward", "float32").make(n)(x),
                   np.complex128)
    C = np.asarray(
        registry.flagship("complex-forward", "float32").make(n)(
            x.astype(np.complex128)), np.complex128)[: n // 2 + 1]
    scale = max(np.max(np.abs(C)), 1e-30)
    assert np.max(np.abs(R - C)) / scale < 5e-6


@settings(max_examples=25, deadline=None)
@given(st.sampled_from(SIZES), st.integers(0, 2**31 - 1))
def test_irfft_of_random_hermitian_spectrum(n, seed):
    """irfft on a random valid half-spectrum (real DC/Nyquist) matches the
    f64 oracle — drives the inverse pre-process with spectra that are NOT
    outputs of our own forward path (roundtrip tests alone would let a
    bug that forward and inverse share cancel out)."""
    rng = np.random.default_rng(seed)
    m = n // 2
    spec = rng.uniform(-10, 10, m + 1) + 1j * rng.uniform(-10, 10, m + 1)
    spec[0] = spec[0].real
    spec[-1] = spec[-1].real
    got = np.asarray(
        registry.flagship("real-inverse", "float32").make(n)(spec),
        np.float64)
    full = np.concatenate([spec, np.conj(spec[1:-1][::-1])])
    expected = ref.idft(full).real
    scale = max(np.max(np.abs(expected)), 1e-30)
    assert np.max(np.abs(got - expected)) / scale < 5e-6
