"""O(N^2) reference DFT ground truth + deterministic signal generators.

TPU-native port of the reference oracle (reference: tests/dft-reference.js:14-88
and tests/correctness/test-helper.js:105-236). Everything here is host-side
numpy float64 — it is the single source of truth that every kernel, every
precision tier, and every surface is validated against.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "dft",
    "idft",
    "real_dft",
    "real_idft",
    "dft2",
    "SIGNALS",
    "REAL_SIGNALS",
    "make_signal",
    "make_real_signal",
    "seeded_rng",
]


def dft(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Direct O(N^2) complex DFT: X[k] = sum_n x[n] exp(-2i pi n k / N).

    Matches tests/dft-reference.js:14-37 (interleaved loops there; a matrix
    product here). Always computed in complex128 regardless of input dtype.
    """
    x = np.asarray(x).astype(np.complex128)
    n = x.shape[axis]
    w = _dft_matrix(n, sign=-1.0)
    return np.moveaxis(np.tensordot(np.moveaxis(x, axis, -1), w, axes=([-1], [0])), -1, axis)


def idft(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Direct O(N^2) inverse DFT with 1/N normalization.

    Matches tests/dft-reference.js:39-60.
    """
    x = np.asarray(x).astype(np.complex128)
    n = x.shape[axis]
    w = _dft_matrix(n, sign=+1.0) / n
    return np.moveaxis(np.tensordot(np.moveaxis(x, axis, -1), w, axes=([-1], [0])), -1, axis)


def real_dft(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Real-input DFT returning N//2+1 Hermitian-unique bins.

    Matches tests/dft-reference.js:62-88 (realDFT).
    """
    x = np.asarray(x).astype(np.float64)
    full = dft(x, axis=axis)
    n = x.shape[axis]
    idx = [slice(None)] * full.ndim
    idx[axis] = slice(0, n // 2 + 1)
    return full[tuple(idx)]


def real_idft(spec: np.ndarray, n: int, axis: int = -1) -> np.ndarray:
    """Inverse of real_dft: N//2+1 bins -> N real samples (1/N normalized)."""
    spec = np.asarray(spec).astype(np.complex128)
    spec = np.moveaxis(spec, axis, -1)
    m = n // 2 + 1
    if spec.shape[-1] != m:
        raise ValueError(f"expected {m} bins for n={n}, got {spec.shape[-1]}")
    full = np.concatenate([spec, np.conj(spec[..., -2:0:-1])], axis=-1)
    out = idft(full, axis=-1).real
    return np.moveaxis(out, -1, axis)


def dft2(x: np.ndarray) -> np.ndarray:
    """2D reference DFT over the trailing two axes (for the mesh-sharded path)."""
    return dft(dft(x, axis=-1), axis=-2)


def _dft_matrix(n: int, sign: float) -> np.ndarray:
    k = np.arange(n, dtype=np.int64)
    # exp(sign * 2i pi * (j*k mod n) / n): phase reduced mod n before the
    # trig call so f64 sin/cos stay fully accurate at large n.
    ang = sign * 2.0 * np.pi * (np.outer(k, k) % n) / n
    return np.cos(ang) + 1j * np.sin(ang)


# ---------------------------------------------------------------------------
# Signal generators (reference: tests/dft-reference.js:145-227 and
# tests/correctness/test-helper.js:174-236). All deterministic; "random" takes
# an explicit seed so golden values are reproducible.
# ---------------------------------------------------------------------------


def seeded_rng(seed: int = 12345) -> np.random.Generator:
    return np.random.default_rng(seed)


def _impulse(n: int) -> np.ndarray:
    x = np.zeros(n, dtype=np.complex128)
    x[0] = 1.0
    return x


def _shifted_impulse(n: int, shift: int = 1) -> np.ndarray:
    x = np.zeros(n, dtype=np.complex128)
    x[shift % n] = 1.0
    return x


def _constant(n: int) -> np.ndarray:
    return np.ones(n, dtype=np.complex128)


def _single_freq(n: int, k: int = 1) -> np.ndarray:
    t = np.arange(n)
    return np.exp(2j * np.pi * k * t / n)


def _cosine(n: int, k: int = 1) -> np.ndarray:
    return np.cos(2 * np.pi * k * np.arange(n) / n).astype(np.complex128)


def _sine(n: int, k: int = 1) -> np.ndarray:
    return np.sin(2 * np.pi * k * np.arange(n) / n).astype(np.complex128)


def _alternating(n: int) -> np.ndarray:
    x = np.ones(n, dtype=np.complex128)
    x[1::2] = -1.0
    return x


def _random_complex(n: int, seed: int = 12345) -> np.ndarray:
    rng = seeded_rng(seed)
    return (rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)).astype(np.complex128)


SIGNALS = {
    "impulse": _impulse,
    "shifted_impulse": _shifted_impulse,
    "constant": _constant,
    "single_freq": _single_freq,
    "cosine": _cosine,
    "sine": _sine,
    "alternating": _alternating,
    "random": _random_complex,
}


def _real_random(n: int, seed: int = 12345) -> np.ndarray:
    rng = seeded_rng(seed)
    return rng.uniform(-1, 1, n).astype(np.float64)


REAL_SIGNALS = {
    "impulse": lambda n: _impulse(n).real,
    "shifted_impulse": lambda n: _shifted_impulse(n).real,
    "constant": lambda n: _constant(n).real,
    "cosine": lambda n: _cosine(n).real,
    "sine": lambda n: _sine(n).real,
    "alternating": lambda n: _alternating(n).real,
    "random": _real_random,
}


def make_signal(name: str, n: int, **kw) -> np.ndarray:
    return SIGNALS[name](n, **kw)


def make_real_signal(name: str, n: int, **kw) -> np.ndarray:
    return REAL_SIGNALS[name](n, **kw)
