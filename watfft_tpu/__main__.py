"""CLI: self-test and audio analysis.

  python -m watfft_tpu [size] [signal] [--dtype float32]
      Reference parity: wat-fft's CLI test mode `node tests/fft.test.js 64
      random` (README.md:297-301 there). Runs the flagship surfaces for one
      size and signal against the f64 oracle and prints per-surface errors.

  python -m watfft_tpu analyze file.wav [--html out.html] [--cpu]
      User-audio path through the playground report (VERDICT r4 #8 — the
      analog of the reference playground's recorder/file input modes,
      playground/src/main.js): decodes the WAV with the stdlib, runs the
      real spectrogram + rfft pipelines, writes a self-contained
      interactive HTML report.
"""

import argparse
import os
import sys

import numpy as np


def _analyze(argv):
    ap = argparse.ArgumentParser(prog="python -m watfft_tpu analyze")
    ap.add_argument("wav", help="input WAV file (PCM 8/16/24/32-bit)")
    ap.add_argument("--html", default=None,
                    help="output path (default: <wav>.html)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import playground_report as pr
    pr_args = ["--wav", args.wav,
               args.html or (os.path.splitext(args.wav)[0] + ".html")]
    if args.cpu:
        pr_args.append("--cpu")
    try:
        pr.main(pr_args)
    except (ValueError, FileNotFoundError) as e:
        print(f"error: {e}", file=sys.stderr)
        sys.exit(2)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "analyze":
        return _analyze(argv[1:])
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
