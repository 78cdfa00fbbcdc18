"""Coverage for utility surfaces: harness classic mode, accuracy helpers,
plan factorization, oracle inverses, fftlib helpers — everything the
dead-surface lint (tools/lint_dead_surfaces.py) tracks."""

import numpy as np

from watfft_tpu.bench.harness import (
    run_benchmark, format_results, significantly_different, BenchResult,
)
from watfft_tpu.utils.accuracy import AccuracyResult, rel_errors
from watfft_tpu.plan import factorize
from watfft_tpu.reference import dft as ref
from watfft_tpu import fftlib


def test_run_benchmark_classic_mode():
    calls = []
    r = run_benchmark("unit", lambda: calls.append(1), items_per_call=7,
                      num_samples=3)
    assert r.ops_per_sec > 0 and r.items_per_call == 7
    assert len(r.samples) == 3 and len(calls) > 3
    table = format_results([r])
    assert "unit" in table and "ops/s" in table


def test_significantly_different_noise_gate():
    a = BenchResult("a", 100.0, 0.0, 1, 1, [])
    b = BenchResult("a", 101.0, 0.0, 1, 1, [])
    assert not significantly_different(a, b)  # 1% < 2% floor
    c = BenchResult("a", 150.0, 0.0, 1, 1, [])
    assert significantly_different(a, c)
    noisy = BenchResult("a", 150.0, 0.3, 1, 1, [])
    assert not significantly_different(noisy, BenchResult("a", 100.0, 0.3, 1, 1, []))


def test_rel_errors_and_result_quality():
    got = np.array([1.0 + 0j, 2.0, 4.0])
    exp = np.array([1.0 + 0j, 2.0, 4.0 + 4e-6j])
    mx, rms = rel_errors(got, exp)
    assert 0 < mx < 1e-5 and 0 < rms <= mx
    r = AccuracyResult("s", 1024, "float32", mx, rms)
    assert r.quality > 0


def test_factorize_policy():
    assert factorize(64) == (64,)
    assert factorize(4096) == (64, 64)
    f = factorize(1 << 20)
    assert np.prod(f) == 1 << 20 and all(x <= 128 for x in f)


def test_real_idft_oracle_roundtrip():
    rng = ref.seeded_rng(0)
    x = rng.uniform(-1, 1, 32)
    spec = ref.real_dft(x)
    back = ref.real_idft(spec, 32)
    np.testing.assert_allclose(back, x, atol=1e-12)
    sig = ref.make_real_signal("cosine", 32)
    np.testing.assert_allclose(sig, np.cos(2 * np.pi * np.arange(32) / 32),
                               atol=1e-12)


def test_fftlib_freq_and_shift_helpers():
    np.testing.assert_allclose(np.asarray(fftlib.rfftfreq(16, 0.5)),
                               np.fft.rfftfreq(16, 0.5))
    x = np.arange(9.0)
    np.testing.assert_allclose(np.asarray(fftlib.ifftshift(fftlib.fftshift(x))), x)
