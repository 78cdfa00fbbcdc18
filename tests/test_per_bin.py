"""Tier 4: per-bin validation — one pure sinusoid per bin, all energy must
land in exactly that bin.

Port of tests/per_bin_validation.test.js (f64, sizes 8-256, tol N*1e-10) and
tests/per_bin_f32.test.js (f32, tol N*5e-6) — "the test class that would have
caught the historical rfft_32 bins-9-15 bug" (reference,
docs/OPTIMIZATION_PLAN.md:160). All N bins are validated in ONE batched
transform: row k of the input matrix is exp(2i pi k t / N), so the expected
spectrum matrix is N * I.
"""

import numpy as np
import pytest

from watfft_tpu import registry
from watfft_tpu.ops.pallas_stockham import _PLAN_OVERRIDES
from watfft_tpu.utils.tolerances import PER_BIN

CASES = [("float64", [8, 16, 32, 64, 128, 256]),
         ("float32", [8, 16, 32, 64, 128, 256, 512, 1024])]

# Sizes carrying measured radix-32/64 plan overrides (Exp 39) get the full
# per-bin sweep too — "the test class that would have caught the historical
# rfft_32 bug" must cover exactly the sizes whose plans are freshest
# (VERDICT r3 #4). Restricted to the plan-owning flagship surface and run
# in fixed-batch chunks: interpret-mode compiles cost 50-210 s per
# (n, batch) shape (compile-dominated — n=4096 first call 208 s, run
# 0.14 s), so one compile per size is the whole budget; every other
# surface already sweeps per-bin to 1024 above.
OVERRIDE_SIZES = sorted(n for n in _PLAN_OVERRIDES if n > 1024)
CHUNK = 512


@pytest.mark.parametrize("dtype,sizes", CASES)
def test_per_bin_complex(dtype, sizes):
    for n in sizes:
        t = np.arange(n)
        basis = np.exp(2j * np.pi * np.outer(np.arange(n), t) / n)  # [bin, time]
        for e in registry.entries("complex-forward", dtype):
            if not (e.min_size <= n <= e.max_size):
                continue
            X = np.asarray(e.make(n)(basis), np.complex128)
            err = np.max(np.abs(X - n * np.eye(n)))
            assert err < PER_BIN[dtype](n), f"{e.name} n={n} err={err:.3e}"


@pytest.mark.parametrize("dtype,sizes", CASES)
def test_per_bin_real(dtype, sizes):
    """cos(2 pi k t / N) per row: bin k gets N/2 (N at DC/Nyquist), all other
    bins zero (reference: per_bin_f32.test.js covers rfft_split)."""
    for n in sizes:
        m = n // 2
        t = np.arange(n)
        basis = np.cos(2 * np.pi * np.outer(np.arange(m + 1), t) / n)  # [bin, time]
        expected = np.zeros((m + 1, m + 1))
        np.fill_diagonal(expected, n / 2)
        expected[0, 0] = n
        expected[m, m] = n
        for e in registry.entries("real-forward", dtype):
            if not (e.min_size <= n <= e.max_size):
                continue
            X = np.asarray(e.make(n)(basis), np.complex128)
            err = np.max(np.abs(X - expected))
            assert err < PER_BIN[dtype](n), f"{e.name} n={n} err={err:.3e}"


@pytest.mark.parametrize("n", OVERRIDE_SIZES)
def test_per_bin_override_sizes(n):
    """All n bins at every radix-32/64 override size, via the flagship
    stockham-pallas surface, chunked at a fixed batch so the interpret-mode
    kernel compiles once per size."""
    entries = [e for e in registry.entries("complex-forward", "float32")
               if e.name == "stockham-pallas" and e.min_size <= n <= e.max_size]
    assert entries, f"flagship surface missing at n={n}"
    fn = entries[0].make(n)
    t = np.arange(n)
    tol = PER_BIN["float32"](n)
    for start in range(0, n, CHUNK):
        bins = np.arange(start, min(start + CHUNK, n))
        basis = np.exp(2j * np.pi * np.outer(bins, t) / n)  # [chunk, time]
        X = np.asarray(fn(basis), np.complex128)
        expected = np.zeros((len(bins), n))
        expected[np.arange(len(bins)), bins] = n
        err = np.max(np.abs(X - expected))
        assert err < tol, f"n={n} bins {start}..{bins[-1]} err={err:.3e}"


@pytest.mark.parametrize("n", [64, 512, 2048])
def test_per_bin_native_3d_layout(n):
    """Per-bin through the NATIVE sublane-folded [n, 8, w] layout — the
    rank-dispatched fast path for chained work (Exp 28/38) gets the same
    all-bins validation as the 2D path (VERDICT r3 #4). Bins ride the
    folded batch axis: basis column k lives at [:, k//w, k%w]."""
    from watfft_tpu.ops.pallas_stockham import stockham_fft_nb
    import jax.numpy as jnp
    t = np.arange(n)
    b = max(1024, ((n + 1023) // 1024) * 1024)  # 3D needs b % (8*128) == 0
    basis = np.exp(2j * np.pi * np.outer(t, np.arange(b)) / n)
    basis[:, n:] = 0.0  # pad columns beyond the n bins
    re3 = np.ascontiguousarray(basis.real.astype(np.float32)).reshape(n, 8, b // 8)
    im3 = np.ascontiguousarray(basis.imag.astype(np.float32)).reshape(n, 8, b // 8)
    ore, oim = stockham_fft_nb(jnp.asarray(re3), jnp.asarray(im3))
    X = (np.asarray(ore) + 1j * np.asarray(oim)).reshape(n, b)[:, :n]
    # forward of exp(-2i pi k t / n) puts all energy at bin k with value n
    expected = np.zeros((n, n))
    np.fill_diagonal(expected, n)
    err = np.max(np.abs(X.T - expected))
    assert err < PER_BIN["float32"](n), f"n={n} 3D-layout err={err:.3e}"


def test_per_bin_rfft2():
    """Tier 4 for the 2D real face (Exp 50): one pure 2D sinusoid per
    (k1, k2), energy must land in exactly bin (k1, k2) of rfft2. All
    h*(w/2+1) representable bins validated in ONE batched transform:
    batch index b = k1*(w/2+1)+k2 carries cos(2pi(k1 n1/h + k2 n2/w))."""
    import jax.numpy as jnp
    from watfft_tpu.ops.fft2 import rfft2_planes
    h, w = 16, 16
    m1 = w // 2 + 1
    k1 = np.arange(h).repeat(m1)                 # [h*m1]
    k2 = np.tile(np.arange(m1), h)
    n1 = np.arange(h)[None, :, None]
    n2 = np.arange(w)[None, None, :]
    phase = 2 * np.pi * (k1[:, None, None] * n1 / h
                         + k2[:, None, None] * n2 / w)
    x = np.cos(phase).astype(np.float32)         # [h*m1, h, w]
    re, im = rfft2_planes(jnp.asarray(x))
    mag = np.abs(np.asarray(re) + 1j * np.asarray(im))  # [h*m1, h, m1]
    tol = h * w * 5e-6
    for b in range(h * m1):
        got = mag[b].copy()
        # a real cosine splits between (k1,k2) and the conjugate bin
        # (-k1, -k2); within the rfft2 half-spectrum the partner appears
        # at ((h-k1)%h, k2) when k2 is 0 or Nyquist, else only (k1,k2)
        peaks = {(int(k1[b]), int(k2[b]))}
        if k2[b] in (0, w // 2):
            peaks.add((int((h - k1[b]) % h), int(k2[b])))
        # each peak holds h*w/2 (h*w when self-conjugate — the set
        # collapses to one entry there); the bound below accepts both
        for (p1, p2) in peaks:
            assert got[p1, p2] > h * w / 2 - tol, (b, p1, p2, got[p1, p2])
            got[p1, p2] = 0.0
        assert np.max(got) < tol, (b, np.unravel_index(np.argmax(got),
                                                       got.shape),
                                   np.max(got))
