"""Tier 6: accuracy thresholds via the shared measurement module.

Port of tests/accuracy.test.js (reference): asserts MAX_REL {f32: 5e-6,
f64: 1e-9} and RMS_REL {f32: 2e-6, f64: 5e-10} using the SAME
measure_accuracy() as the diagnostic tool (tools/accuracy_report.py), so tool
and test cannot disagree (accuracy.test.js:18). Thresholds sit ~4x above
measured baselines to catch order-of-magnitude regressions without flaking.
"""

import numpy as np
import pytest

from watfft_tpu import registry
from watfft_tpu.utils.accuracy import measure_accuracy
from watfft_tpu.utils.tolerances import MAX_REL, RMS_REL

SIZES = [16, 64, 256, 1024, 4096]


@pytest.mark.parametrize("dtype", ["float32", "float64"])
@pytest.mark.parametrize("surface,kind,inverse", [
    ("complex-forward", "c2c", False),
    ("complex-inverse", "c2c", True),
    ("real-forward", "r2c", False),
])
def test_accuracy_thresholds(surface, kind, inverse, dtype):
    for e in registry.entries(surface, dtype):
        for n in SIZES:
            if not (e.min_size <= n <= e.max_size):
                continue
            r = measure_accuracy(e.make(n), n, dtype, kind=kind,
                                 inverse=inverse, surface=e.name)
            assert r.max_rel < MAX_REL[dtype], f"{e.name} n={n} max_rel={r.max_rel:.3e}"
            assert r.rms_rel < RMS_REL[dtype], f"{e.name} n={n} rms_rel={r.rms_rel:.3e}"


def test_quality_stays_flat():
    """quality = max_rel/(eps*sqrt(log2 N)) should not blow up with N
    (tools/accuracy_report.js:13-16: near-optimal is 0.3-3)."""
    e = registry.flagship("complex-forward", "float32")
    qs = []
    for n in SIZES:
        r = measure_accuracy(e.make(n), n, "float32", surface=e.name)
        qs.append(r.quality)
    assert max(qs) < 40, f"quality degraded: {qs}"
