#!/usr/bin/env python
"""Isolation benchmark of a third-party FFT (torch.fft / pocketfft, CPU).

Analog of the reference's standalone GPU context
(/root/reference/benchmarks/deno/fft_gpu.bench.ts:5-9 and
deno/README.md:24-40): numbers for a DIFFERENT library in a DIFFERENT
execution class, measured in isolation and intentionally NOT ranked against
watfft_tpu. torch.fft on host CPU is a synchronous single-node transform
with per-call framework dispatch overhead; watfft_tpu is a TPU-resident
batched kernel behind an RPC tunnel. Comparing them head-to-head would be
misleading, so — like the reference — we don't: no row of this file enters
headline.latest.json or the registry coverage meta-test.

Two regimes, mirroring the reference's latency/throughput split:

- latency: one transform per call, B=1 (framework dispatch dominates at
  small N — torch's per-call floor, the analog of webgpu-fft's ~14 ms
  device round-trip);
- throughput: torch's batch API at fixed N (the favorable regime the
  reference's GPU library lacked, deno/README.md:36-40; concurrency-based
  overlap is pointless on this 1-core runner and torch batches natively).

Writes benchmarks/results/torch_isolation.latest.json. Exits 0 with a note
if torch is unavailable (CI does not install it).
"""

import json
import os
import statistics
import sys
import time

SIZES = [64, 256, 1024, 4096, 16384, 65536]
BATCHES = [1, 8, 64, 512]
THROUGHPUT_N = 1024


def _median_time(fn, min_time_s=0.25, max_reps=10_000):
    """Median seconds/call over ~min_time_s of work, harness.py-style
    (warmup, then calibrated batches so the timer is outside the hot loop)."""
    fn()
    fn()  # warmup: allocator + plan cache
    t0 = time.perf_counter()
    fn()
    once = max(time.perf_counter() - t0, 1e-9)
    per_sample = max(1, min(max_reps, int(min_time_s / (5 * once))))
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(per_sample):
            fn()
        samples.append((time.perf_counter() - t0) / per_sample)
    med = statistics.median(samples)
    cv = statistics.pstdev(samples) / med if med else 0.0
    return med, round(cv, 4), samples


def main() -> int:
    try:
        import torch
    except ImportError:
        print("torch not installed; isolation context skipped (exit 0)")
        return 0
    quick = "--quick" in sys.argv
    sizes = SIZES[:3] if quick else SIZES
    batches = BATCHES[:2] if quick else BATCHES
    torch.manual_seed(0)
    rows = []

    print(f"# torch.fft isolation context (CPU, {torch.get_num_threads()} "
          f"thread(s), torch {torch.__version__}) — NOT a head-to-head")
    print(f"{'regime':<12} {'case':<16} {'per-FFT':>12} {'FFTs/s':>14} {'cv':>6}")
    for n in sizes:
        x = torch.randn(1, n, dtype=torch.complex64)
        med, cv, samples = _median_time(lambda: torch.fft.fft(x))
        rows.append({"name": f"torch-isolation/latency/c64/n{n}",
                     "ops_per_sec": 1.0 / med, "cv": cv,
                     "batch": 1, "samples": [1.0 / s for s in samples]})
        print(f"{'latency':<12} {'n=%d' % n:<16} {med * 1e6:>10.1f}us "
              f"{1.0 / med:>14,.0f} {cv:>6.3f}")

    for b in batches:
        x = torch.randn(b, THROUGHPUT_N, dtype=torch.complex64)
        med, cv, samples = _median_time(lambda: torch.fft.fft(x))
        rows.append({"name": f"torch-isolation/throughput/c64/n{THROUGHPUT_N}/b{b}",
                     "ops_per_sec": b / med, "cv": cv,
                     "batch": b, "samples": [b / s for s in samples]})
        print(f"{'throughput':<12} {'n=%d b=%d' % (THROUGHPUT_N, b):<16} "
              f"{med / b * 1e6:>10.1f}us {b / med:>14,.0f} {cv:>6.3f}")

    out = {
        "bench_id": "torch-isolation",
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "note": ("isolation context: third-party library, different execution "
                 "class; not ranked against watfft surfaces by design "
                 "(reference: benchmarks/deno/fft_gpu.bench.ts:5-9)"),
        "torch": torch.__version__,
        "threads": torch.get_num_threads(),
        "results": rows,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "torch_isolation.latest.json")
    if not quick:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"saved -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
