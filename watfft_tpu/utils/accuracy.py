"""Accuracy measurement shared by the diagnostic tool and the test suite.

Port of tools/accuracy_report.js (reference), whose `measureAccuracy()` is
imported by tests/accuracy.test.js:18 "so tool and test cannot disagree" —
the same invariant holds here: tests/test_accuracy.py and
tools/accuracy_report.py both call `measure_accuracy`.

Metrics per (surface, size): max relative error, RMS relative error, and
`quality = max_rel / (eps * sqrt(log2 N))` which should stay ~flat with N
(tools/accuracy_report.js:13-16).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..reference import dft as ref
from .tolerances import EPS

__all__ = ["AccuracyResult", "measure_accuracy", "rel_errors"]


@dataclass
class AccuracyResult:
    surface: str
    n: int
    dtype: str
    max_rel: float
    rms_rel: float

    @property
    def quality(self) -> float:
        return self.max_rel / (EPS[self.dtype] * math.sqrt(math.log2(self.n)))


def rel_errors(got: np.ndarray, expected: np.ndarray) -> tuple[float, float]:
    """(max_rel, rms_rel) with errors normalized by the spectrum's RMS
    magnitude (denominator floor), matching the reference's relative-error
    treatment that avoids division blowup at near-zero bins."""
    got = np.asarray(got, np.complex128)
    expected = np.asarray(expected, np.complex128)
    err = np.abs(got - expected)
    scale = max(float(np.sqrt(np.mean(np.abs(expected) ** 2))), 1e-300)
    rel = err / np.maximum(np.abs(expected), scale)
    return float(np.max(rel)), float(np.sqrt(np.mean(rel**2)))


def measure_accuracy(transform, n: int, dtype: str, kind: str = "c2c",
                     inverse: bool = False, seed: int = 12345,
                     surface: str = "?") -> AccuracyResult:
    """Run `transform` on a seeded random input and compare against the f64
    reference DFT. `transform` maps a host array [n] -> spectrum/signal."""
    rng = ref.seeded_rng(seed)
    if kind == "c2c":
        x = (rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n))
        expected = ref.idft(x) if inverse else ref.dft(x)
    elif kind == "r2c":
        x = rng.uniform(-1, 1, n)
        expected = ref.real_dft(x)
    elif kind == "c2r":
        sig = rng.uniform(-1, 1, n)
        x = ref.real_dft(sig)
        expected = sig.astype(np.complex128)
    else:
        raise ValueError(kind)
    got = np.asarray(transform(x))
    mx, rms = rel_errors(got, expected)
    return AccuracyResult(surface=surface, n=n, dtype=dtype, max_rel=mx, rms_rel=rms)
