"""CLI self-test: `python -m watfft_tpu [size] [signal] [--dtype float32]`.

Reference parity: wat-fft's CLI test mode `node tests/fft.test.js 64 random`
(README.md:297-301 there). Runs the flagship surfaces for one size and
signal against the f64 oracle and prints per-surface errors.
"""

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m watfft_tpu")
    ap.add_argument("size", nargs="?", type=int, default=64)
    ap.add_argument("signal", nargs="?", default="random")
    ap.add_argument("--dtype", default="float32", choices=["float32", "float64"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu or args.dtype == "float64":
        import jax
        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from watfft_tpu import registry
    from watfft_tpu.reference import dft as ref
    from watfft_tpu.utils.tolerances import MAX_REL

    n = args.size
    x = ref.make_signal(args.signal, n)
    expected = ref.dft(x)
    scale = max(float(np.max(np.abs(expected))), 1e-30)

    import jax
    import jax.numpy as jnp

    def to_host(a):
        # complex device arrays must leave via planes (axon tunnel limit)
        if isinstance(a, jax.Array) and jnp.iscomplexobj(a):
            return np.asarray(a.real) + 1j * np.asarray(a.imag)
        return np.asarray(a)

    print(f"size={n} signal={args.signal} dtype={args.dtype}")
    failures = 0
    for e in registry.entries("complex-forward", args.dtype,
                              include_baselines=True):
        if not (e.min_size <= n <= e.max_size):
            continue
        try:
            got = to_host(e.make(n)(x))
            err = float(np.max(np.abs(got - expected))) / scale
            ok = err < MAX_REL[args.dtype] * 4
            print(f"  {e.surface:<16} {e.name:<20} err={err:.3e} "
                  f"{'OK' if ok else 'FAIL'}")
            failures += 0 if ok else 1
        except Exception as ex:
            print(f"  {e.surface:<16} {e.name:<20} ERROR: {str(ex)[:60]}")
            failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
