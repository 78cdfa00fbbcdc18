"""Stage-logging numpy Stockham reference for kernel debugging.

Port of tools/stockham_reference.js (reference): a plain-host implementation
of EXACTLY the same mixed-radix stage plan, twiddle layout, and interleave
pattern as the Pallas kernel (ops/pallas_stockham.py), with optional
per-stage dumps. When the kernel misbehaves, run both side by side and diff
the first divergent stage.

Usage:
  python tools/stockham_reference.py 64            # verify plan for n=64
  python tools/stockham_reference.py 64 --log      # dump every stage
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from watfft_tpu.ops.pallas_stockham import stage_plan, make_twiddle_pack


def stockham_reference(x: np.ndarray, inverse: bool = False,
                       log: bool = False) -> np.ndarray:
    """x: [n, b] complex (time-major). Returns FFT along axis 0 using the
    kernel's exact stage plan in f64."""
    n, b = x.shape
    stages = stage_plan(n)
    twre, twim, offsets = make_twiddle_pack(n, inverse)
    tw = twre.astype(np.float64).ravel() + 1j * twim.astype(np.float64).ravel()
    c = x.astype(np.complex128)
    for idx, (r, l) in enumerate(stages):
        q = n // r
        parts = [c[p * q:(p + 1) * q].copy() for p in range(r)]
        if offsets[idx] >= 0:
            o = offsets[idx]
            for p in range(1, r):
                parts[p] *= tw[o + (p - 1) * q:o + p * q, None]
        if inverse and idx == len(stages) - 1 and offsets[idx] < 0:
            parts = [p_ / n for p_ in parts]
        elif inverse and idx == len(stages) - 1:
            parts[0] = parts[0] / n  # twiddled parts carry 1/n in the table
        sign = +1.0 if inverse else -1.0
        w = np.exp(sign * 2j * np.pi / r)
        outs = [sum(parts[p] * w ** (p * qq) for p in range(r))
                for qq in range(r)]
        g = n // (r * l)
        out = np.empty_like(c)
        for qq in range(r):
            out.reshape(g, r, l, b)[:, qq] = outs[qq].reshape(g, l, b)
        c = out
        if log:
            print(f"stage {idx}: R={r} l={l} "
                  f"first={c[0, 0]:.6f} norm={np.linalg.norm(c):.6f}")
    return c


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    log = "--log" in sys.argv
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (n, 4)) + 1j * rng.uniform(-1, 1, (n, 4))
    got = stockham_reference(x, log=log)
    expected = np.fft.fft(x, axis=0)
    err = np.max(np.abs(got - expected)) / np.max(np.abs(expected))
    # accuracy floor is the kernel's f32 twiddle tables (deliberately shared
    # so value dumps diff exactly against the kernel): expect ~1e-8
    print(f"n={n}: stage-plan reference vs np.fft rel err = {err:.2e} "
          f"({'OK' if err < 1e-6 else 'MISMATCH'})")
    back = stockham_reference(got, inverse=True)
    rt = np.max(np.abs(back - x))
    print(f"native-inverse roundtrip err = {rt:.2e} "
          f"({'OK' if rt < 1e-6 else 'MISMATCH'})")


if __name__ == "__main__":
    main()
