#!/usr/bin/env python
"""On-chip verification after the Exp 39 plan-override change: every
dispatch path that consumes stage_plan at an overridden size must still
compile and produce correct results vs numpy f64.

Covers: stockham 2D + 3D, real hybrid + fused fwd, bluestein (pow2 core
at an overridden m), large-nb pipe/cube factors that hit 1024/2048.

Usage: python tools/verify_plans39.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from watfft_tpu import api
from watfft_tpu.ops.pallas_stockham import stockham_fft_nb
from watfft_tpu.ops.pallas_rfft import rfft_nb, irfft_nb
from watfft_tpu.ops.large import fft_large_nb

rng = np.random.default_rng(7)
failures = []


def report(name, err, tol):
    flag = "ok " if err < tol else "FAIL"
    print(f"  {flag} {name:<42} err={err:.2e}", flush=True)
    if err >= tol:
        failures.append(name)


def c2c(n, b, three_d):
    shape = (n, 8, b // 8) if three_d else (n, b)
    xre = rng.uniform(-1, 1, shape).astype(np.float32)
    xim = rng.uniform(-1, 1, shape).astype(np.float32)
    yre, yim = stockham_fft_nb(jnp.asarray(xre), jnp.asarray(xim))
    zre, zim = stockham_fft_nb(yre, yim, inverse=True)
    flat = lambda a: np.asarray(a).reshape(n, -1)
    x = flat(xre).astype(np.float64) + 1j * flat(xim).astype(np.float64)
    got = flat(yre).astype(np.float64) + 1j * flat(yim).astype(np.float64)
    ref = np.fft.fft(x, axis=0)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    report(f"c2c n={n} {'3D' if three_d else '2D'} fwd", err, 1e-5)
    rt = np.max(np.abs(flat(zre) - flat(xre))) + np.max(np.abs(flat(zim) - flat(xim)))
    report(f"c2c n={n} {'3D' if three_d else '2D'} roundtrip", rt, 1e-5)


def r2c(n, b):
    x = rng.uniform(-1, 1, (n, b)).astype(np.float32)
    yre, yim = rfft_nb(jnp.asarray(x))
    xb = irfft_nb(yre, yim)
    ref = np.fft.rfft(np.asarray(x).astype(np.float64), axis=0)
    got = (np.asarray(yre).astype(np.float64)
           + 1j * np.asarray(yim).astype(np.float64))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    report(f"r2c n={n} fwd", err, 1e-5)
    rt = np.max(np.abs(np.asarray(xb) - x))
    report(f"r2c n={n} roundtrip", rt, 1e-5)


def large(n):
    xre = rng.uniform(-1, 1, (n, 128)).astype(np.float32)
    xim = rng.uniform(-1, 1, (n, 128)).astype(np.float32)
    yre, yim = fft_large_nb(jnp.asarray(xre), jnp.asarray(xim))
    x0 = (np.asarray(xre)[:, 0].astype(np.float64)
          + 1j * np.asarray(xim)[:, 0].astype(np.float64))
    ref = np.fft.fft(x0)
    got = (np.asarray(yre)[:, 0].astype(np.float64)
           + 1j * np.asarray(yim)[:, 0].astype(np.float64))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    report(f"large-nb n={n}", err, 2e-5)


def bluestein(n):
    from watfft_tpu import fftlib
    # host numpy in: fftlib splits complex on host (the tunnel cannot
    # transfer complex dtypes — CLAUDE.md gotcha)
    x = (rng.uniform(-1, 1, (8, n)) + 1j * rng.uniform(-1, 1, (8, n)))
    got = np.asarray(fftlib.fft(x.astype(np.complex64)))
    ref = np.fft.fft(x)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    report(f"bluestein n={n}", err, 1e-4)


def main():
    import jax
    print(f"platform={jax.devices()[0].platform}")
    for n in (32, 1024, 2048):
        c2c(n, 8192 if n <= 1024 else 4096, True)
    for n in (1024, 4096, 8192):
        c2c(n, 1024, False)
    for n in (64, 2048, 4096, 8192, 16384):
        r2c(n, 1024)
    for n in (1 << 15, 1 << 17, 1 << 20):
        large(n)
    bluestein(1500)  # m = 4096 pow2 core — overridden plan
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
