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
    ap.add_argument("--no-header", action="store_true")
    args = ap.parse_args()

    if args.dtype is None:
        # x64 is a global, pre-initialization switch: float64 contexts
        # require it, while f32 TPU compiles break under it (weak-typed
        # scalars become f64 and the axon backend rejects them). Run each
        # dtype in its own subprocess.
        import subprocess
        for i, dt in enumerate(("float32", "float64")):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--sizes", args.sizes, "--dtype", dt]
            if args.cpu:
                cmd.append("--cpu")
            if i:
                cmd.append("--no-header")
            rc = subprocess.run(cmd).returncode
            if rc:
                sys.exit(rc)
        return

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        # f64 contexts live on the CPU device regardless of backend, and
        # global x64 breaks TPU Pallas lowering (verified on chip: the df
        # kernel fails to legalize under x64 — index types become i64), so
        # the f64 sweep runs on the CPU backend. On-chip df accuracy is
        # separately pinned by tests/test_doublefloat + EXPERIMENT_LOG
        # Exp 16 (4.5e-15..1.9e-14 at n=16..4096).
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from watfft_tpu import registry
    from watfft_tpu.utils.accuracy import measure_accuracy

    sizes = [int(s) for s in args.sizes.split(",")]
    dtypes = [args.dtype] if args.dtype else ["float32", "float64"]

    if not args.no_header:
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

    if args.dtype == "float32":
        # bf16 tiers (registered under dtype 'bfloat16'): the interop tier
        # (bf16 planes, f32 butterflies — I/O-rounding-limited ~4e-3) and
        # the compute tier (WATFFT_BF16_COMPUTE: bf16 butterflies end-to-end
        # ~1e-2). Quality is vs bfloat16's own eps (2^-8), so ~flat-with-N
        # values near 1 mean "as good as the dtype allows". Runs in the f32
        # subprocess — no x64 interaction.
        from watfft_tpu import config
        for surface, kind, inverse in (("complex-forward", "c2c", False),
                                       ("complex-inverse", "c2c", True)):
            for e in registry.entries(surface, "bfloat16"):
                for n in sizes:
                    if not (e.min_size <= n <= e.max_size):
                        continue
                    for tier, flag in ((e.name, False),
                                       (e.name + "-c", True)):
                        config.BF16_COMPUTE = flag
                        try:
                            r = measure_accuracy(e.make(n), n, "bfloat16",
                                                 kind=kind, inverse=inverse,
                                                 surface=tier)
                        except Exception as ex:
                            print(f"{surface:<18} {tier:<16} {'bf16':<8} "
                                  f"{n:>6} ERROR: {str(ex)[:40]}")
                            continue
                        finally:
                            config.BF16_COMPUTE = False
                        print(f"{surface:<18} {tier:<16} {'bf16':<8} {n:>6} "
                              f"{r.max_rel:>10.2e} {r.rms_rel:>10.2e} "
                              f"{r.quality:>8.2f}")


if __name__ == "__main__":
    main()
