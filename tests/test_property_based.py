"""Tier 3: property-based random testing (hypothesis = the fast-check analog).

Port of tests/property_based.test.js (reference): arbitrary bounded float
arrays at relaxed 1e-6-level tolerances, motivated by the historical rfft_32
bug that curated inputs masked (property_based.test.js:4-6).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from watfft_tpu import registry
from watfft_tpu.reference import dft as ref

SIZES = [8, 32, 64, 128, 512]

finite = st.floats(min_value=-10, max_value=10, allow_nan=False,
                   allow_infinity=False, width=32)


@settings(max_examples=20, deadline=None)
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


@settings(max_examples=15, deadline=None)
@given(st.sampled_from(SIZES), st.integers(0, 2**31 - 1))
def test_hermitian_symmetry_of_real_input(n, seed):
    """FFT of a real signal is Hermitian: X[N-k] == conj(X[k])."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-10, 10, n).astype(np.complex128)
    X = np.asarray(registry.flagship("complex-forward", "float32").make(n)(x),
                   np.complex128)
    mirrored = np.conj(np.concatenate([X[:1], X[1:][::-1]]))
    assert np.max(np.abs(X - mirrored)) < 5e-5 * max(np.max(np.abs(X)), 1.0)
