#!/usr/bin/env python
"""Single-case debug runner: one surface x size x signal, per-bin dump.

Analog of the reference's CLI test mode (`node tests/fft.test.js 64 random`,
reference README.md:297-301): when a sweep fails, rerun exactly one case and
see every bin next to the f64 oracle instead of re-running the whole tier.

Usage:
    python tools/single_case.py 64 random                 # complex fwd, all impls
    python tools/single_case.py 1024 sine --surface real-forward
    python tools/single_case.py 256 impulse --impl stockham-pallas --bins 16
    python tools/single_case.py 64 random --dtype float64 --inverse

Exit status 1 if any implementation exceeds 4x the tier tolerance (the same
gate as tests/test_fft_reference.py), so it can be scripted.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from watfft_tpu import registry  # noqa: E402
from watfft_tpu.reference import dft as ref  # noqa: E402
from watfft_tpu.utils import tolerances as tol  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("n", type=int)
    p.add_argument("signal", choices=sorted(set(ref.SIGNALS) | set(ref.REAL_SIGNALS)))
    p.add_argument("--surface", default="complex-forward", choices=registry.SURFACES)
    p.add_argument("--inverse", action="store_true",
                   help="shorthand: flips *-forward to *-inverse")
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "float64", "bfloat16"))
    p.add_argument("--impl", default=None,
                   help="run only the implementation with this registry name")
    p.add_argument("--bins", type=int, default=32,
                   help="print at most this many bins (worst-first), 0 = all")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        # Same constraint as tools/accuracy_report.py: f64 surfaces run on
        # the CPU backend (global x64 breaks TPU Pallas index legalization).
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    surface = args.surface
    if args.inverse:
        surface = surface.replace("-forward", "-inverse")

    # Build (input, expected) from the f64 oracle. real-inverse consumes the
    # forward oracle's spectrum and must reproduce the time-domain signal.
    if surface.startswith("real"):
        if args.signal not in ref.REAL_SIGNALS:
            p.error(f"signal {args.signal!r} is complex-only")
        sig = ref.REAL_SIGNALS[args.signal](args.n)
        if surface == "real-forward":
            x, expected = sig, ref.real_dft(sig)
        else:
            x, expected = ref.real_dft(sig), sig.astype(np.complex128)
    else:
        x = ref.SIGNALS[args.signal](args.n)
        expected = ref.dft(x) if surface == "complex-forward" else ref.idft(x)
    xb = x[None, :]

    cands = registry.entries(surface, args.dtype)
    if args.impl is not None:
        cands = [e for e in cands if e.name == args.impl]
        if not cands:
            names = [e.name for e in registry.entries(surface, args.dtype)]
            p.error(f"no impl {args.impl!r} for {surface}/{args.dtype}; have {names}")
    cands = [e for e in cands if e.min_size <= args.n <= e.max_size]
    if not cands:
        print(f"no registered implementation covers {surface}/{args.dtype} n={args.n}")
        return 1

    tolerance = tol.MAX_REL[args.dtype] * 4
    scale = max(np.max(np.abs(expected)), 1e-30)
    failed = False
    for e in cands:
        got = np.asarray(e.make(args.n)(xb), np.complex128)[0]
        err = np.abs(got - expected) / scale
        worst = float(np.max(err))
        ok = worst < tolerance
        failed |= not ok
        print(f"\n== {e.name}  {surface}/{args.dtype}  n={args.n}  signal={args.signal}"
              f"  max-rel={worst:.3e}  tol={tolerance:.1e}  "
              f"{'OK' if ok else 'FAIL'}")
        order = np.argsort(-err)
        show = order if args.bins == 0 else order[:args.bins]
        print(f"{'bin':>6} {'got':>26} {'expected':>26} {'rel-err':>10}")
        for k in sorted(show.tolist()):
            g, ee = got[k], expected[k]
            print(f"{k:>6} {g.real:+.6e}{g.imag:+.6e}j {ee.real:+.6e}{ee.imag:+.6e}j"
                  f" {err[k]:>10.2e}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
