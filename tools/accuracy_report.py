"""Accuracy report across every registered surface x size.

Port of tools/accuracy_report.js (reference): max-rel / rms-rel / quality
(= max_rel / (eps * sqrt(log2 N)), should stay ~flat with N) per surface x
transform x size, using the SAME measure_accuracy as tests/test_accuracy.py
so tool and test cannot disagree (accuracy_report.js:10-17, 37).

Usage: python tools/accuracy_report.py [--sizes 16,64,...] [--dtype float32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16,64,256,1024,4096")
    ap.add_argument("--dtype", default=None, choices=[None, "float32", "float64"])
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from watfft_tpu import registry
    from watfft_tpu.utils.accuracy import measure_accuracy

    sizes = [int(s) for s in args.sizes.split(",")]
    dtypes = [args.dtype] if args.dtype else ["float32", "float64"]

    print(f"{'surface':<18} {'impl':<16} {'dtype':<8} {'n':>6} "
          f"{'max_rel':>10} {'rms_rel':>10} {'quality':>8}")
    for surface, kind, inverse in (
        ("complex-forward", "c2c", False),
        ("complex-inverse", "c2c", True),
        ("real-forward", "r2c", False),
    ):
        for dtype in dtypes:
            for e in registry.entries(surface, dtype, include_baselines=True):
                for n in sizes:
                    if not (e.min_size <= n <= e.max_size):
                        continue
                    try:
                        r = measure_accuracy(e.make(n), n, dtype, kind=kind,
                                             inverse=inverse, surface=e.name)
                    except Exception as ex:
                        print(f"{surface:<18} {e.name:<16} {dtype:<8} {n:>6} "
                              f"ERROR: {str(ex)[:40]}")
                        continue
                    print(f"{surface:<18} {e.name:<16} {dtype:<8} {n:>6} "
                          f"{r.max_rel:>10.2e} {r.rms_rel:>10.2e} "
                          f"{r.quality:>8.2f}")


if __name__ == "__main__":
    main()
