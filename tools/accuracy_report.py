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
        # 2D faces (round-5): the fused batched kernel path (fft2_nb), the
        # thin-batch in-VMEM-transpose path (Exp 52, single image), and the
        # 2D real path (Exp 50) — vs the numpy f64 oracle. Quality uses
        # N = h*w in the same eps*sqrt(log2 N) normalization.
        import numpy as np
        import jax.numpy as jnp
        from watfft_tpu.ops.fft2 import (fft2_planes, rfft2_planes,
                                         irfft2_planes)
        rng2 = np.random.default_rng(2026)

        def _q(max_rel, n):
            return max_rel / (np.finfo(np.float32).eps * np.sqrt(np.log2(n)))

        for name, shape, real in (("fft2-nb", (128, 256, 256), False),
                                  ("fft2-thin", (512, 512), False),
                                  ("rfft2-planes", (128, 256, 256), True),
                                  ("rfft2-thin", (1024, 1024), True)):
            try:
                h, w = shape[-2], shape[-1]
                if real:
                    x = rng2.uniform(-1, 1, shape).astype(np.float32)
                    re, im = rfft2_planes(jnp.asarray(x))
                    got = np.asarray(re) + 1j * np.asarray(im)
                    ref = np.fft.rfft2(x.astype(np.float64), axes=(-2, -1))
                    back = np.asarray(irfft2_planes(re, im))
                    inv_err = np.max(np.abs(back - x))
                else:
                    a = rng2.uniform(-1, 1, shape).astype(np.float32)
                    b = rng2.uniform(-1, 1, shape).astype(np.float32)
                    re, im = fft2_planes(jnp.asarray(a), jnp.asarray(b))
                    got = np.asarray(re) + 1j * np.asarray(im)
                    ref = np.fft.fft2(a.astype(np.float64)
                                      + 1j * b.astype(np.float64),
                                      axes=(-2, -1))
                    bre, bim = fft2_planes(re, im, inverse=True)
                    inv_err = max(np.max(np.abs(np.asarray(bre) - a)),
                                  np.max(np.abs(np.asarray(bim) - b)))
                scale = np.max(np.abs(ref))
                max_rel = float(np.max(np.abs(got - ref)) / scale)
                rms_rel = float(np.sqrt(np.mean(np.abs(got - ref) ** 2))
                                / scale)
                surf = "2d-forward" if not real else "2d-real"
                print(f"{surf:<18} {name:<16} {'float32':<8} {h*w:>6} "
                      f"{max_rel:>10.2e} {rms_rel:>10.2e} "
                      f"{_q(max_rel, h*w):>8.2f}  inv_abs {inv_err:.2e}")
            except Exception as ex:
                print(f"{'2d':<18} {name:<16} {'float32':<8} {'':>6} "
                      f"ERROR: {str(ex)[:40]}")

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
