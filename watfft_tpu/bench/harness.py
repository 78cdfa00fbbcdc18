"""Statistical benchmark harness.

Port of benchmarks/lib/harness.js (reference): warmup, batch calibration so
no timer/sync calls sit in the hot loop, 10 samples of ~150 ms each, median +
coefficient of variation, JSON persistence with git/device metadata
(harness.js:27-92, 186-221). Adapted for JAX's async dispatch: a "batch" is K
back-to-back dispatches with one `block_until_ready` at the end, so device
work pipelines exactly as it would in production.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import subprocess
import time
from dataclasses import dataclass, asdict
from typing import Callable

import jax

__all__ = ["BenchResult", "run_benchmark", "save_results", "format_results"]

WARMUP_MS = 200.0
TARGET_SAMPLE_MS = 150.0
NUM_SAMPLES = 10


def time_chain(step, args, r1: int = 32, r2: int = 160, reps: int = 3,
               target_s: float = 0.06) -> float:
    """Seconds per `step` iteration, measured as the slope between two
    lax.fori_loop chain lengths.

    Why: on the axon tunnel a timed call carries ~28 ms of fixed RPC/sync
    overhead and `block_until_ready` alone does not wait for execution, so
    single-call timings measure the tunnel. A runtime fori_loop chain (a)
    cannot be constant-folded the way an unrolled op chain can, and (b) the
    slope (t(r2)-t(r1))/(r2-r1) cancels every fixed cost. Sync is a [1,1]
    readback of the first output leaf.

    Adaptive calibration (round-2 fix for small-N jitter): after a pilot
    slope estimate, r2 is raised until the chain's *device work*
    (slope * r2) is at least `target_s`, so the measured difference
    dominates the multi-ms round-trip jitter instead of drowning in it.
    With the default r2=160 a 40 us/iter kernel yields two ~30 ms
    measurements differing by ~5 ms — inside the jitter band; calibrated
    chains make the difference 10x the jitter.
    """
    import functools
    import numpy as np

    @functools.partial(jax.jit, static_argnames=("r",))
    def chain(carry, r):
        return jax.lax.fori_loop(0, r, lambda i, c: step(c), carry)

    def timed(r):
        t0 = time.perf_counter()
        out = chain(args, r=r)
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf[(slice(0, 1),) * leaf.ndim])  # rank-agnostic sync
        return time.perf_counter() - t0

    # warm both lengths (compile), pilot-estimate the slope, then lengthen
    # the long chain until its device work dominates the fixed overhead.
    timed(r1)
    pilot = (timed(r2) - timed(r1)) / (r2 - r1)
    if pilot > 0:
        want = int(target_s / pilot)
        while r2 < want and r2 < 16384:
            r2 *= 2
        timed(r2)  # compile the calibrated length

    for attempt in range(2):
        ts1 = sorted(timed(r1) for _ in range(reps + 2))
        ts2 = sorted(timed(r2) for _ in range(reps + 2))
        slope = (ts2[len(ts2) // 2] - ts1[len(ts1) // 2]) / (r2 - r1)
        if slope > 0:
            return slope
        r2 *= 2  # too fast to resolve: lengthen the chain and retry
        timed(r2)
    return max(slope, 1e-9)


@dataclass
class BenchResult:
    name: str
    ops_per_sec: float  # transforms (or calls) per second, median
    cv: float           # coefficient of variation across samples
    batch: int          # dispatches per timed sample
    items_per_call: int
    samples: list
    # effective duplex bandwidth (bytes-moved / time, counting simultaneous
    # read+write as ONE pass — directly comparable to the per-direction HBM
    # clamp). 0.0 when the row has no meaningful traffic model.
    eff_gbps: float = 0.0


def _time_batch(fn: Callable, k: int) -> float:
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn()
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def run_benchmark(name: str, fn: Callable, items_per_call: int = 1,
                  num_samples: int = NUM_SAMPLES) -> BenchResult:
    """fn: zero-arg callable issuing one (possibly batched) transform call.
    items_per_call: transforms per call (for ops/s accounting)."""
    # Warmup (compile + caches)
    deadline = time.perf_counter() + WARMUP_MS / 1e3
    _time_batch(fn, 1)
    while time.perf_counter() < deadline:
        _time_batch(fn, 1)
    # Batch calibration: pick k so one sample is ~TARGET_SAMPLE_MS
    t1 = _time_batch(fn, 1)
    k = max(1, int(TARGET_SAMPLE_MS / 1e3 / max(t1, 1e-7)))
    # Samples
    times = [_time_batch(fn, k) for _ in range(num_samples)]
    per_call = [t / k for t in times]
    med = statistics.median(per_call)
    mean = statistics.fmean(per_call)
    sd = statistics.pstdev(per_call)
    return BenchResult(
        name=name,
        ops_per_sec=items_per_call / med,
        cv=(sd / mean) if mean > 0 else 0.0,
        batch=k,
        items_per_call=items_per_call,
        samples=[items_per_call / t for t in per_call],
    )


def _git_meta() -> dict:
    def _run(args):
        try:
            return subprocess.run(args, capture_output=True, text=True,
                                  timeout=5).stdout.strip()
        except Exception:
            return ""
    return {
        "commit": _run(["git", "rev-parse", "--short", "HEAD"]),
        "branch": _run(["git", "rev-parse", "--abbrev-ref", "HEAD"]),
        "dirty": bool(_run(["git", "status", "--porcelain"])),
    }


def _device_meta() -> dict:
    d = jax.devices()[0]
    return {"platform": d.platform, "device": str(d), "n_devices": jax.device_count(),
            "jax": jax.__version__}


def save_results(bench_id: str, results: list[BenchResult],
                 out_dir: str = "benchmarks/results") -> str:
    """Persist results JSON with git + device metadata
    (harness.js:186-221 analog)."""
    os.makedirs(out_dir, exist_ok=True)
    payload = {
        "bench_id": bench_id,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "git": _git_meta(),
        "device": _device_meta(),
        "results": [asdict(r) for r in results],
    }
    path = os.path.join(out_dir, f"{bench_id}.latest.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    return path


def format_results(results: list[BenchResult]) -> str:
    lines = [f"{'benchmark':<48} {'ops/s':>14} {'cv':>7}"]
    for r in results:
        lines.append(f"{r.name:<48} {r.ops_per_sec:>14,.0f} {r.cv:>6.1%}")
    return "\n".join(lines)


def significantly_different(a: BenchResult, b: BenchResult) -> bool:
    """Noise-aware diff: |delta| > max(2%, 3x combined CV)
    (scripts/bench-diff.js:33-34, 85-86 analog)."""
    delta = abs(a.ops_per_sec - b.ops_per_sec) / max(b.ops_per_sec, 1e-30)
    return delta > max(0.02, 3.0 * math.hypot(a.cv, b.cv))
