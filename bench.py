#!/usr/bin/env python
"""Headline benchmark + registry-driven surface sweep on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value = geometric-mean speedup of the flagship kernel over jnp.fft across
ALL NINE powers of the BASELINE.json N sweep (N=16..4096, matching the
reference's per-size table README.md:17-25). Timing = seconds per
forward+inverse roundtrip measured as the SLOPE between two lax.fori_loop
chain lengths (cancels the axon tunnel's ~28 ms fixed dispatch/sync
overhead; see watfft_tpu/bench/harness.py:ChainTimer).

Budget discipline (round-5, VERDICT r4 #3 — the r4 driver run skipped 11
sections after the complex sweep): the headline JSON line prints
IMMEDIATELY after the headline sweep; then sections run COVERAGE-FIRST —
one representative row per registry surface (real, rinv, real-fused, f64,
large-nb, bluestein, rfft-large, fourstep, stft, fft2, rfft2, fft-large,
then the cheap secondary surfaces dispatch/bf16/speed-tier/mxu-dft)
BEFORE any per-size depth sweeps (cinv-4096, real-16..), which run LAST.
Depth is ADAPTIVE (_reps/sweep_reps): the sweep alone measured 128-554 s
across tunnel/compile-service states, so reps degrade as budget burns —
a slow state truncates depth, never surfaces. Under WATFFT_BENCH_BUDGET_S
(default 540 s) a truncated run saves to headline.partial.json and a
completed budget run to headline.default.latest.json, so the committed
--full snapshot (headline.latest.json, full reps everywhere) is never
clobbered. (Reference analog: time-budgeted CI bench smoke, ci.yml.)

Clamp policy (round-3, ADVICE r2): only OUR times are clamped up to the
duplex-HBM floor (anti-cheat — a Pallas kernel cannot move data faster
than the pins); jnp baseline times are reported RAW, because pure-XLA
fori chains can legitimately beat HBM rooflines via VMEM-resident carries
(Exp 17) — clamping the baseline UP would inflate our speedups. Every
timed row carries eff_gbps (bytes-moved / time, duplex-counted) in the
results JSON so each number is auditable against physics; rows within
1.2x of the clamp are flagged on stderr. Per-rep times/ratios are
persisted in each row's samples/cv fields (VERDICT r3 Weak #6).

The DEFAULT mode benches one representative point for EVERY non-baseline
registry surface (BENCHED_SURFACES below; enforced by
tests/test_meta.py::test_bench_enumerates_registry — the reference's
BENCH_COVERAGE meta-test, wat-surfaces.mjs:217-231, existed because a stale
bench mis-reported for two generations), plus the STFT workload, the 2D
FFT faces (256^2 batched + BASELINE config 5's 4096^2 + rfft2), and the
large-N four-step (BASELINE configs 4-5).

vs_baseline = value / 2.0 (the BASELINE target is >=2x jnp.fft per chip).
Details go to stderr + benchmarks/results/headline.latest.json.
"""

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SIZES = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096]
TOTAL_ELEMS = 1 << 21
# Physical-floor clamp bandwidth. Exp 17 used the 819 GB/s datasheet figure
# per direction, but Exp 28's DMA-3D kernel SUSTAINS 27.9us for a roundtrip
# the old model floors at 41us (two sessions, 7-rep medians) — i.e. the
# chip demonstrably moves >1.17 TB/s per direction on aliased in-place
# chains. The clamp is an anti-cheat guard, not a performance model: it is
# set at 2x the datasheet figure so it never clips a real measured kernel
# while still rejecting absurd numbers. Pure-XLA chains can legitimately
# beat HBM rooflines outright (VMEM-resident carries, Exp 17).
HBM_BW_PER_DIR = 1.638e12

# Every non-baseline registry surface must appear here (meta-test enforced).
BENCHED_SURFACES = {
    "stockham-pallas",    # headline sweep
    "stockham-bf16",      # bf16 interop-tier point
    "dispatch",           # public API (planner) point
    "mxu-dft",            # small-N MXU alternative
    "rfft-pallas",        # real path sweep
    "rfft-pallas-fused",  # single-pass fused real point
    "rfft-large",         # large-N real path (n > 16384 dispatch target)
    "bluestein",          # arbitrary-size chirp-z (non-pow2 fftlib route)
    "doublefloat-pallas", # f64 tier complex point
    "doublefloat-rfft",   # f64 tier real point
    "large-nb",           # batched four-step: the n > 16384 dispatch target
    "fourstep-mxu",       # XLA fallback path (non-pow2-friendly backends)
}


def _roundtrip_floor(plane_elems: int) -> float:
    return (4 * plane_elems * 4) / HBM_BW_PER_DIR


def main(full: bool = False) -> None:
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("WATFFT_BENCH_BUDGET_S", "540"))
    if full:
        budget_s = float("inf")
    truncated = []

    def over_budget(section: str) -> bool:
        elapsed = time.perf_counter() - t_start
        if elapsed > budget_s:
            truncated.append(section)
            print(f"  [budget] skipping section {section} "
                  f"({elapsed:.0f}s elapsed > "
                  f"{budget_s:.0f}s budget)", file=sys.stderr)
            return True
        # section-start mark: the budget profile (which section eats the
        # driver budget) is otherwise invisible in the stderr log
        print(f"  [t+{elapsed:.0f}s] section {section}", file=sys.stderr)
        return False

    import jax
    import jax.numpy as jnp
    from watfft_tpu.api import FFTContext, RFFTContext
    from watfft_tpu.ops.pallas_stockham import stockham_fft_nb
    from watfft_tpu.bench.harness import (save_results, BenchResult,
                                          ChainTimer, paired_chain,
                                          time_chain, run_benchmark,
                                          enable_compile_cache)
    enable_compile_cache()

    rng = np.random.default_rng(12345)
    results = []
    speedups = []

    def record(name, t, b, items=2, nbytes=0, times=None):
        """nbytes: duplex-counted HBM traffic model for the timed step (the
        same accounting as _roundtrip_floor: simultaneous read+write is ONE
        pass), so eff_gbps is directly auditable against HBM_BW_PER_DIR.
        times: the per-rep slope times — persisted as per-rep ops/s samples
        + their cv, so the snapshot carries the real spread of exactly what
        the reported number was computed from (VERDICT r3 Weak #6)."""
        eff = (nbytes / t / 1e9) if nbytes else 0.0
        samples = [items * b / tt for tt in (times or [])]
        cv = 0.0
        if times and len(times) > 1:
            m = statistics.fmean(times)
            cv = statistics.pstdev(times) / m if m > 0 else 0.0
        results.append(BenchResult(name=name, ops_per_sec=items * b / t,
                                   cv=round(cv, 4), batch=b,
                                   items_per_call=items * b,
                                   samples=[round(s, 1) for s in samples],
                                   eff_gbps=round(eff, 1)))
        if nbytes and eff > HBM_BW_PER_DIR / 1e9 / 1.2:
            print(f"  !! {name}: eff {eff:,.0f} GB/s is within 1.2x of the "
                  f"{HBM_BW_PER_DIR/1e9:,.0f} GB/s clamp", file=sys.stderr)

    def _reps(k: int = 3) -> int:
        """Adaptive section depth (VERDICT r4 #3, round-5 profile): the
        headline sweep alone measured anywhere from 128 s to 554 s across
        process states (tunnel/compile-service dependent), so a fixed
        per-section rep count either wastes a fast state or blows the
        budget in a slow one. Once HALF the budget is spent, coverage
        sections drop to a single rep — a slow state truncates DEPTH,
        never surfaces. --full (the committed snapshot) always runs full
        reps."""
        if full:
            return k
        # budget mode caps at 2 even in a FAST state: the full-depth
        # section tour measured ~600 s total (t+ marks, 2026-08-21) —
        # more than the whole budget regardless of sweep speed
        return 1 if time.perf_counter() - t_start > 0.5 * budget_s \
            else min(k, 2)

    def _solo(step, args, reps=None, floor=0.0, **kw):
        """Single-sided chain timing: compile once, median of `reps` slopes.
        Returns (median, per-rep times)."""
        reps = _reps() if reps is None else reps
        t = ChainTimer(step, args)
        t.calibrate(**kw)
        ts = [max(t.slope(), floor) for _ in range(reps)]
        return sorted(ts)[reps // 2], ts

    # ---------------- headline sweep: flagship kernel vs jnp.fft ----------
    raw_times = {}
    for n in SIZES:
        b = max(128, TOTAL_ELEMS // n)
        host_re = rng.uniform(-1, 1, (b, n)).astype(np.float32)
        host_im = rng.uniform(-1, 1, (b, n)).astype(np.float32)
        xre = jnp.asarray(host_re)
        xim = jnp.asarray(host_im)
        tre = np.ascontiguousarray(host_re.T)
        tim = np.ascontiguousarray(host_im.T)
        if n <= 2048 and b % 1024 == 0:
            # native sublane-folded layout [n, 8, b/8] (free host reshape;
            # Exp 28/38 — chained calls skip the 2D<->3D boundary relayout;
            # 3D wins through n=2048): the kernel rank-dispatches on it
            tre = tre.reshape(n, 8, b // 8)
            tim = tim.reshape(n, 8, b // 8)
        xre_t = jnp.asarray(tre)
        xim_t = jnp.asarray(tim)

        def jstep(c):
            a, bb = c
            z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
            return z.real, z.imag

        # Measurement policy (round-2 revision 2): PAIRED INTERLEAVED reps.
        # The tunnel's jitter band shifts by the HOUR (jnp at n=64 measured
        # 43us in one run and 120us in the next; ours 37us and 68us), so
        # sequential blocks of reps for each side can land in different
        # windows and bias the ratio either way. Each rep measures OURS
        # then JNP back-to-back (~seconds apart, far inside the drift
        # scale); the reported speedup is the MEDIAN OF PAIRED RATIOS.
        ours_name = "stockham-pallas"
        try:
            def pstep(c):
                a, bb = c
                a, bb = stockham_fft_nb(a, bb, inverse=False)
                return stockham_fft_nb(a, bb, inverse=True)
            # sweep reps degrade with elapsed budget share (same rationale
            # as _reps: in a slow tunnel/compile state the sweep alone
            # measured 554 s — the metric must still print AND leave room
            # for the coverage sections; median-of-pairs per size holds
            # at any rep count)
            el = time.perf_counter() - t_start
            sweep_reps = (3 if full or el < 0.3 * budget_s
                          else 2 if el < 0.5 * budget_s else 1)
            t_ours, t_base, speedup, st = paired_chain(
                pstep, (xre_t, xim_t), jstep, (xre, xim),
                reps=sweep_reps, floor_ours=_roundtrip_floor(xre_t.size))
        except Exception as e:
            print(f"  n={n}: pallas failed ({str(e)[:80]}), using fourstep",
                  file=sys.stderr)
            ours_name = "fourstep-mxu"
            ctx = FFTContext(n, "float32")

            def fstep(c):
                a, bb = c
                a, bb = ctx.forward_planes_fourstep(a, bb)
                return ctx.inverse_planes_fourstep(a, bb)
            t_ours, ots = _solo(fstep, (xre, xim))
            t_base, bts = _solo(jstep, (xre, xim))
            speedup = t_base / t_ours
            st = {"ours_times": ots, "base_times": bts}

        raw_times[n] = t_ours
        speedups.append(speedup)
        # ops/s counts single transforms: one roundtrip = 2 transforms;
        # traffic model: complex roundtrip = 4 duplex plane-passes
        nbytes = 16 * n * b
        record(f"watfft/{ours_name}/f32/n{n}", t_ours, b, nbytes=nbytes,
               times=st["ours_times"])
        record(f"jnp.fft/f32/n{n}", t_base, b, nbytes=nbytes,
               times=st["base_times"])
        print(f"  n={n:<6} ours({ours_name})={2*b/t_ours:,.0f}/s  "
              f"jnp={2*b/t_base:,.0f}/s  x{speedups[-1]:.2f}", file=sys.stderr)

    geomean = math.exp(sum(map(math.log, speedups)) / len(speedups))

    # THE driver-parsed metric prints NOW — before any other section — so a
    # timeout anywhere below still leaves the round measured (VERDICT r3 #1).
    print(json.dumps({
        "metric": "batched f32 complex FFT geomean speedup vs jnp.fft (N=16-4096)",
        "value": round(geomean, 4),
        "unit": "x",
        "vs_baseline": round(geomean / 2.0, 4),
    }))
    sys.stdout.flush()

    # =======================================================================
    # COVERAGE PASS — one representative row per surface, in this order,
    # before ANY depth sweep or secondary tier (VERDICT r4 #3: the r4 driver
    # run burned its budget on secondary tiers and skipped 11 real/f64/large
    # sections; now a truncated run loses depth, never a surface).
    # =======================================================================

    from watfft_tpu import planner as _planner
    from watfft_tpu import config as _rcfg
    from watfft_tpu.ops.large import fft_large_nb, fft_large
    from watfft_tpu.ops.pallas_rfft import (rfft_nb, irfft_nb, rfft_nb_fused,
                                            irfft_nb_fused)

    _r2c_fwd = {"rfft-pallas": rfft_nb, "rfft-pallas-fused": rfft_nb_fused}
    _r2c_inv = {"rfft-pallas": irfft_nb, "rfft-pallas-fused": irfft_nb_fused}

    def _r2c_fns(n):
        kf = _planner.r2c_kernel(n, "float32", "forward")
        ki = _planner.r2c_kernel(n, "float32", "inverse")
        return _r2c_fwd[kf], _r2c_inv[ki], kf

    # ---------------- real path (rfft/irfft roundtrip) --------------------
    # Planner-dispatched kernels (per-size, PER-DIRECTION codelet table,
    # Exp 32/35/41/47): fused forward at RFFT_FUSED_FWD_SIZES, hybrid
    # elsewhere and for the inverse; MXU selection dots per
    # RFFT_MXU_SELECT_*_SIZES on the 2D layout. Rows are recorded under the
    # FORWARD direction's registry surface name. The representative n=1024
    # point runs in the coverage pass; the other eight sizes are the
    # real-depth sweep below.
    real_speedups = []

    def bench_real_size(n):
        b = max(128, TOTAL_ELEMS // n)
        host = rng.uniform(-1, 1, (n, b)).astype(np.float32)
        if n <= 2 * _rcfg.DMA3D_MAX_N and b % 1024 == 0:
            # native sublane-folded 3D layout (Exp 37): free host
            # reshape; the hybrid kernels rank-dispatch on it and the
            # Hermitian passes run directly on 3D planes
            xr_t = jnp.asarray(host.reshape(n, 8, b // 8))
            rf, rif, sname = rfft_nb, irfft_nb, "rfft-pallas"
        else:
            xr_t = jnp.asarray(host)
            rf, rif, sname = _r2c_fns(n)

        def rstep(c):
            re, im = rf(c)
            return rif(re, im)

        xr = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

        def jrstep(c):
            return jnp.fft.irfft(jnp.fft.rfft(c), n=n)
        # real roundtrip moves ~half the complex traffic (one real plane
        # in, ~two half-length spectrum planes out, per direction)
        t_r, t_jr, ratio, st = paired_chain(
            rstep, xr_t, jrstep, xr, reps=_reps(),
            floor_ours=_roundtrip_floor(xr_t.size) / 2)
        nbytes = 8 * n * b  # ~2 duplex passes/direction (matches floor)
        record(f"watfft/{sname}/f32/n{n}", t_r, b, nbytes=nbytes,
               times=st["ours_times"])
        record(f"jnp.fft/real/f32/n{n}", t_jr, b, nbytes=nbytes,
               times=st["base_times"])
        real_speedups.append(ratio)
        print(f"  [real] n={n:<6} ours={2*b/t_r:,.0f}/s "
              f"jnp={2*b/t_jr:,.0f}/s x{ratio:.2f}", file=sys.stderr)

    if not over_budget("real-rep-1024"):
        try:
            bench_real_size(1024)
        except Exception as e:
            print(f"  real n=1024 bench failed: {str(e)[:120]}",
                  file=sys.stderr)

    # ---------------- standalone real inverse (VERDICT r2 Missing #3) -----
    # irfft's output shape differs from its input, so a pure-inverse chain
    # needs a serialization trick: each iteration folds the output back
    # into the donated spectrum carry at ~1e-30 scale. The fold must
    # consume EVERY output element (two overlapping half-reads) — a scalar
    # y[0,0] consumer lets XLA dead-code-slice the hybrid kernels' XLA
    # pre/post passes to one element and fakes the comparison (Exp 35's
    # pruning trap). Both sides use the identical fold, so the ratio is fair.
    for n in ((1024, 4096) if full else (4096,)):
        if over_budget(f"rinv-{n}"):
            break
        try:
            b = max(128, TOTAL_ELEMS // n)
            m = n // 2
            use3d_r = n <= 2 * _rcfg.DMA3D_MAX_N and b % 1024 == 0
            if use3d_r:  # native 3D layout (Exp 37): hybrid kernels
                rf, rif, sname = rfft_nb, irfft_nb, "rfft-pallas"
                shp_s = (m + 1, 8, b // 8)
                shp_x = (n, 8, b // 8)
            else:
                rf, rif, sname = _r2c_fns(n)
                shp_s = (m + 1, b)
                shp_x = (n, b)
            sre_t = jnp.asarray(rng.uniform(-1, 1, shp_s).astype(np.float32))
            sim_t = jnp.asarray(rng.uniform(-1, 1, shp_s).astype(np.float32))

            def ristep(c):
                re, im = c
                y = rif(re, im)
                upd = (y[:m + 1] + y[m - 1:]) * jnp.float32(1e-30)
                return re + upd, im

            xr_t = jnp.asarray(rng.uniform(-1, 1, shp_x).astype(np.float32))

            def rfstep(c):
                yre, yim = rf(c)
                upd = jnp.concatenate([yre, yim[1:]], axis=0)[:n]
                return c + upd * jnp.float32(1e-30)

            sre = jnp.asarray(
                rng.uniform(-1, 1, (b, m + 1)).astype(np.float32))
            sim = jnp.asarray(
                rng.uniform(-1, 1, (b, m + 1)).astype(np.float32))

            def jristep(c):
                re, im = c
                y = jnp.fft.irfft(re + 1j * im, n=n)
                upd = (y[:, :m + 1] + y[:, m - 1:]) * jnp.float32(1e-30)
                return re + upd, im
            # single real direction ~ quarter of complex-roundtrip traffic
            floor_r = _roundtrip_floor(n * b) / 4
            t_ri, t_jri, ratio, st = paired_chain(
                ristep, (sre_t, sim_t), jristep, (sre, sim),
                reps=_reps(), floor_ours=floor_r)
            t_rf_, _ = _solo(rfstep, xr_t, floor=floor_r)
            nbytes = 4 * n * b
            record(f"watfft/{sname}/f32-inv/n{n}", t_ri, b, items=1,
                   nbytes=nbytes, times=st["ours_times"])
            record(f"jnp.fft/real-inv/f32/n{n}", t_jri, b, items=1,
                   nbytes=nbytes, times=st["base_times"])
            print(f"  [rinv] n={n:<6} ours={b/t_ri:,.0f}/s "
                  f"jnp={b/t_jri:,.0f}/s x{ratio:.2f}  "
                  f"inv/fwd={t_ri/t_rf_:.2f}", file=sys.stderr)
        except Exception as e:
            print(f"  rinv bench failed: {str(e)[:120]}", file=sys.stderr)

    # ---------------- fully-fused real variant (alternate surface) --------
    if not over_budget("real-fused"):
        try:
            n, b = 1024, TOTAL_ELEMS // 1024
            xr_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))

            def rfstep(c):
                re, im = rfft_nb_fused(c)
                return irfft_nb_fused(re, im)
            t_rf, ts = _solo(rfstep, xr_t)
            record(f"watfft/rfft-pallas-fused/f32/n{n}", t_rf, b, times=ts)
            print(f"  [real-fused] n={n}: {2*b/t_rf:,.0f}/s", file=sys.stderr)
        except Exception as e:
            print(f"  real-fused bench failed: {str(e)[:120]}",
                  file=sys.stderr)

    # ---------------- f64 tier (double-f32 kernels) -----------------------
    # Paired with the f32 flagship at the SAME [n, b] shape (VERDICT r4
    # Weak #6: the "~3.3x the f32 cost" claim must be recomputed by the
    # apparatus each round, not quoted). jnp provides no on-chip f64 FFT
    # (v5e has no f64 units — that is WHY the double-f32 tier exists), so
    # the honest baseline is our own f32 tier at the identical shape; the
    # accuracy snapshot carries the ~6e-15 error column that justifies the
    # cost ratio.
    if not over_budget("f64"):
        try:
            from watfft_tpu.ops.doublefloat import (df_fft_nb, df_rfft_nb,
                                                    df_irfft_nb, split_f64)
            # default: the reference's flagship f64 table point; --full
            # spans its whole range
            for n in ((64, 1024, 4096) if full else (1024,)):
                b = 256
                x = rng.uniform(-1, 1, (n, b))
                y = rng.uniform(-1, 1, (n, b))
                rh, rl = split_f64(x)
                ih, il = split_f64(y)
                args = tuple(jnp.asarray(a) for a in (rh, rl, ih, il))

                def dfstep(c):
                    a, bb, cc, d = df_fft_nb(*c, inverse=False)
                    return df_fft_nb(a, bb, cc, d, inverse=True)
                t_df, ts = _solo(dfstep, args)
                record(f"watfft/doublefloat-pallas/f64/n{n}", t_df, b,
                       times=ts)
                if full or _reps() > 1:
                    # f32 pair at the same shape — the tier's cost
                    # baseline (skipped in lite mode: it is a ratio
                    # companion, not a surface; the committed full
                    # snapshot recomputes it every round)
                    f32args = (jnp.asarray(x.astype(np.float32)),
                               jnp.asarray(y.astype(np.float32)))

                    def f32step(c):
                        a, bb = c
                        a, bb = stockham_fft_nb(a, bb, inverse=False)
                        return stockham_fft_nb(a, bb, inverse=True)
                    t_f32, f32ts = _solo(f32step, f32args)
                    record(f"watfft/stockham-pallas/f32-pair/n{n}", t_f32,
                           b, times=f32ts)
                    print(f"  [df-complex] n={n} b={b}: {2*b/t_df:,.0f}/s "
                          f"({t_df/t_f32:.2f}x the f32 cost at this shape)",
                          file=sys.stderr)
                else:
                    print(f"  [df-complex] n={n} b={b}: {2*b/t_df:,.0f}/s "
                          f"(lite)", file=sys.stderr)

            n, b = 1024, 256
            xh, xl = split_f64(rng.uniform(-1, 1, (n, b)))
            rargs = (jnp.asarray(xh), jnp.asarray(xl))

            def dfrstep(c):
                orh, orl, oih, oil = df_rfft_nb(c[0], c[1])
                oh, ol = df_irfft_nb(orh, orl, oih, oil)
                return oh, ol
            t_dfr, ts = _solo(dfrstep, rargs)
            record(f"watfft/doublefloat-rfft/f64/n{n}", t_dfr, b, times=ts)
            print(f"  [df-real] n={n} b={b}: {2*b/t_dfr:,.0f}/s",
                  file=sys.stderr)
        except Exception as e:
            print(f"  doublefloat bench failed: {str(e)[:120]}",
                  file=sys.stderr)

    # ---------------- n > 16384 dispatch domain: batched four-step --------
    # the planner sends n > STOCKHAM_MAX_N here (round-2 Exp 22: the XLA
    # einsum path lost at 0.75x; large-nb wins 1.18x at 32768, 2.59x at 2^17)
    if not over_budget("large-nb"):
        try:
            # b=128: fused stage-2 path (Exp 27)
            for n, b in (((32768, 128), (1 << 17, 128)) if full
                         else ((1 << 17, 128),)):
                xre_t = jnp.asarray(
                    rng.uniform(-1, 1, (n, b)).astype(np.float32))
                xim_t = jnp.asarray(
                    rng.uniform(-1, 1, (n, b)).astype(np.float32))

                def lnstep(c):
                    a, bb = c
                    a, bb = fft_large_nb(a, bb, inverse=False)
                    return fft_large_nb(a, bb, inverse=True)
                xre = jnp.asarray(
                    rng.uniform(-1, 1, (b, n)).astype(np.float32))
                xim = jnp.asarray(
                    rng.uniform(-1, 1, (b, n)).astype(np.float32))

                def jstep8(c):
                    a, bb = c
                    z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
                    return z.real, z.imag
                t_ln, t_j8, ratio, st = paired_chain(
                    lnstep, (xre_t, xim_t), jstep8, (xre, xim),
                    reps=_reps(), floor_ours=_roundtrip_floor(xre_t.size))
                nbytes = 16 * n * b
                record(f"watfft/large-nb/f32/n{n}", t_ln, b, nbytes=nbytes,
                       times=st["ours_times"])
                record(f"jnp.fft/f32/n{n}", t_j8, b, nbytes=nbytes,
                       times=st["base_times"])
                print(f"  [large-nb] n={n} b={b}: ours={2*b/t_ln:,.0f}/s "
                      f"jnp={2*b/t_j8:,.0f}/s x{ratio:.2f}", file=sys.stderr)
        except Exception as e:
            print(f"  large-nb bench failed: {str(e)[:120]}", file=sys.stderr)

    # ---------------- arbitrary-size chirp-z (Bluestein) ------------------
    # non-pow2 n: three pow2 transforms on the fast kernels vs jnp.fft's
    # own arbitrary-n path — the fftlib route for every size the pow2
    # kernels cannot take directly
    if not over_budget("bluestein"):
        try:
            from watfft_tpu.ops.bluestein import bluestein_fft_nb
            n, b = 1000, 2048
            xre_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
            xim_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))

            def blstep(c):
                a, bb = c
                a, bb = bluestein_fft_nb(a, bb, inverse=False)
                return bluestein_fft_nb(a, bb, inverse=True)
            xre = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
            xim = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

            def jblstep(c):
                a, bb = c
                z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
                return z.real, z.imag
            t_bl, t_jbl, ratio, st = paired_chain(
                blstep, (xre_t, xim_t), jblstep, (xre, xim), reps=_reps())
            record(f"watfft/bluestein/f32/n{n}", t_bl, b,
                   times=st["ours_times"])
            record(f"jnp.fft/nonpow2/f32/n{n}", t_jbl, b,
                   times=st["base_times"])
            print(f"  [bluestein] n={n} b={b}: ours={2*b/t_bl:,.0f}/s "
                  f"jnp={2*b/t_jbl:,.0f}/s x{ratio:.2f}", file=sys.stderr)
        except Exception as e:
            print(f"  bluestein bench failed: {str(e)[:120]}",
                  file=sys.stderr)

    # ---------------- large-N real path (planner target n > 16384) -------
    if not over_budget("rfft-large"):
        try:
            from watfft_tpu.ops.large import rfft_large_nb, irfft_large_nb
            for n, b in (((32768, 128), (1 << 17, 128)) if full
                         else ((32768, 128),)):
                xr_t = jnp.asarray(
                    rng.uniform(-1, 1, (n, b)).astype(np.float32))

                def rlstep(c):
                    re, im = rfft_large_nb(c)
                    return irfft_large_nb(re, im)
                xr = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

                def jrlstep(c):
                    return jnp.fft.irfft(jnp.fft.rfft(c), n=n)
                t_rl, t_jrl, ratio, st = paired_chain(
                    rlstep, xr_t, jrlstep, xr, reps=_reps(),
                    floor_ours=_roundtrip_floor(xr_t.size) / 2)
                nbytes = 8 * n * b
                record(f"watfft/rfft-large/f32/n{n}", t_rl, b, nbytes=nbytes,
                       times=st["ours_times"])
                record(f"jnp.fft/real/f32/n{n}", t_jrl, b, nbytes=nbytes,
                       times=st["base_times"])
                print(f"  [rfft-large] n={n} b={b}: ours={2*b/t_rl:,.0f}/s "
                      f"jnp={2*b/t_jrl:,.0f}/s x{ratio:.2f}", file=sys.stderr)
        except Exception as e:
            print(f"  rfft-large bench failed: {str(e)[:120]}",
                  file=sys.stderr)

    # ---------------- four-step XLA fallback surface ----------------------
    if not over_budget("fourstep"):
        try:
            n, b = 32768, 64
            ctx = FFTContext(n, "float32")
            xre = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
            xim = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

            def fstep(c):
                a, bb = c
                a, bb = ctx.forward_planes_fourstep(a, bb)
                return ctx.inverse_planes_fourstep(a, bb)
            t_f, ts = _solo(fstep, (xre, xim))
            record(f"watfft/fourstep-mxu/f32/n{n}", t_f, b, times=ts)
            print(f"  [fourstep-xla] n={n} b={b}: {2*b/t_f:,.0f}/s",
                  file=sys.stderr)
        except Exception as e:
            print(f"  fourstep bench failed: {str(e)[:120]}", file=sys.stderr)

    # ---------------- STFT workload (BASELINE config 4) -------------------
    if not over_budget("stft"):
        try:
            n, b = 1024, 4096
            # native 3D layout (Exps 37/38): the STFT frame batch rides it
            xr_t = jnp.asarray(
                rng.uniform(-1, 1, (n, b)).astype(np.float32)
                .reshape(n, 8, b // 8))

            def sstep(c):
                re, im = rfft_nb(c)
                # keep carry shape [n, 8, W]: drop the extra bin row
                return jnp.concatenate([re[:-1], im[:-1]], axis=0)[:n]
            xr = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

            def jstft(c):
                y = jnp.fft.rfft(c)
                return jnp.concatenate(
                    [y.real[:, :-1], y.imag[:, :-1]], axis=1)[:, :n]
            t_s, t_js, ratio, st = paired_chain(sstep, xr_t, jstft, xr,
                                                reps=_reps())
            print(f"  [stft-4096x1024] ours={b/t_s:,.0f}/s "
                  f"jnp={b/t_js:,.0f}/s x{ratio:.2f}", file=sys.stderr)
            record("watfft/stft-workload/f32/n1024", t_s, b, items=1,
                   times=st["ours_times"])
            record("jnp.fft/stft-workload/f32/n1024", t_js, b, items=1,
                   times=st["base_times"])
        except Exception as e:
            print(f"  stft bench failed: {str(e)[:120]}", file=sys.stderr)

    # ---------------- single-chip 2D FFT (fft2) ----------------------------
    # separable row/column passes on the flagship kernel with one transpose
    # (ops/fft2.py) vs jnp.fft.fft2 — the single-chip face of BASELINE
    # config 5's 2D axis (the mesh-sharded version is validated in the
    # driver dryrun; it cannot be timed on one chip)
    if not over_budget("fft2"):
        try:
            from watfft_tpu.ops.fft2 import fft2_planes
            bb2, h2, w2 = 128, 256, 256  # b=128: native fft2_nb path (Exp 36)
            zre = jnp.asarray(
                rng.uniform(-1, 1, (bb2, h2, w2)).astype(np.float32))
            zim = jnp.asarray(
                rng.uniform(-1, 1, (bb2, h2, w2)).astype(np.float32))

            def f2step(c):
                a, bbx = c
                a, bbx = fft2_planes(a, bbx, inverse=False)
                return fft2_planes(a, bbx, inverse=True)

            def jf2step(c):
                a, bbx = c
                z = jnp.fft.ifft2(jnp.fft.fft2(a + 1j * bbx))
                return z.real, z.imag
            t_f2, t_jf2, ratio, st = paired_chain(
                f2step, (zre, zim), jf2step, (zre, zim), reps=_reps(),
                floor_ours=2 * _roundtrip_floor(zre.size))  # 2 passes/dir
            nbytes = 32 * bb2 * h2 * w2  # 4 duplex plane-pair passes
            record(f"watfft/fft2-planes/f32/{h2}x{w2}", t_f2, bb2,
                   nbytes=nbytes, times=st["ours_times"])
            record(f"jnp.fft/fft2/f32/{h2}x{w2}", t_jf2, bb2, nbytes=nbytes,
                   times=st["base_times"])
            print(f"  [fft2] {h2}x{w2} b={bb2}: ours={2*bb2/t_f2:,.0f}/s "
                  f"jnp={2*bb2/t_jf2:,.0f}/s x{ratio:.2f}", file=sys.stderr)
        except Exception as e:
            print(f"  fft2 bench failed: {str(e)[:120]}", file=sys.stderr)

    # ---------------- BASELINE config 5: single 4096^2 fft2 ---------------
    # One full-size image per call (b=1) — the named BASELINE shape, now a
    # committed headline row each round instead of a one-off probe citation
    # (VERDICT r4 Weak #5). PARITY.md cites the round-3 2.63x chip run;
    # this row re-validates it per round.
    if not over_budget("fft2-4096"):
        try:
            from watfft_tpu.ops.fft2 import fft2_planes
            h4 = w4 = 4096
            zre4 = jnp.asarray(
                rng.uniform(-1, 1, (h4, w4)).astype(np.float32))
            zim4 = jnp.asarray(
                rng.uniform(-1, 1, (h4, w4)).astype(np.float32))

            def f24step(c):
                a, bbx = c
                a, bbx = fft2_planes(a, bbx, inverse=False)
                return fft2_planes(a, bbx, inverse=True)

            def jf24step(c):
                a, bbx = c
                z = jnp.fft.ifft2(jnp.fft.fft2(a + 1j * bbx))
                return z.real, z.imag
            t_f24, t_jf24, ratio, st = paired_chain(
                f24step, (zre4, zim4), jf24step, (zre4, zim4),
                reps=_reps(), r1=4, r2=24,
                floor_ours=2 * _roundtrip_floor(zre4.size))
            nbytes = 32 * h4 * w4
            record(f"watfft/fft2-planes/f32/{h4}x{w4}", t_f24, 1,
                   nbytes=nbytes, times=st["ours_times"])
            record(f"jnp.fft/fft2/f32/{h4}x{w4}", t_jf24, 1, nbytes=nbytes,
                   times=st["base_times"])
            print(f"  [fft2-4096] {h4}x{w4}: ours={2/t_f24:,.1f}/s "
                  f"jnp={2/t_jf24:,.1f}/s x{ratio:.2f}", file=sys.stderr)
        except Exception as e:
            print(f"  fft2-4096 bench failed: {str(e)[:120]}",
                  file=sys.stderr)

    # ---------------- 2D real FFT (rfft2/irfft2 roundtrip) ----------------
    # Round-4's composed row (per-axis 1D pieces + swapaxes) measured 1.8x —
    # under the 2x bar. This benches the dedicated fused path instead
    # (ops/fft2.rfft2_planes: pack-as-complex, ONE half-width fused fft2,
    # one 2D Hermitian recombination pass), vs jnp.fft.rfft2/irfft2.
    if not over_budget("rfft2"):
        try:
            from watfft_tpu.ops.fft2 import rfft2_planes, irfft2_planes
            shapes = ([(128, 256, 256), (32, 512, 512)] if full
                      else [(128, 256, 256)])
            for br, hr, wr in shapes:
                xr2 = jnp.asarray(
                    rng.uniform(-1, 1, (br, hr, wr)).astype(np.float32))

                def r2step(c):
                    re, im = rfft2_planes(c)
                    return irfft2_planes(re, im)

                def jr2step(c, hr=hr, wr=wr):
                    z = jnp.fft.rfft2(c)
                    return jnp.fft.irfft2(z, s=(hr, wr))
                t_r2, t_jr2, ratio, st = paired_chain(
                    r2step, xr2, jr2step, xr2, reps=_reps(),
                    floor_ours=_roundtrip_floor(xr2.size))
                nbytes = 16 * br * hr * wr  # ~2 duplex plane-pair passes/dir
                record(f"watfft/rfft2-planes/f32/{hr}x{wr}", t_r2, br,
                       nbytes=nbytes, times=st["ours_times"])
                record(f"jnp.fft/rfft2/f32/{hr}x{wr}", t_jr2, br,
                       nbytes=nbytes, times=st["base_times"])
                print(f"  [rfft2] {hr}x{wr} b={br}: ours={2*br/t_r2:,.0f}/s "
                      f"jnp={2*br/t_jr2:,.0f}/s x{ratio:.2f}", file=sys.stderr)
        except Exception as e:
            print(f"  rfft2 bench failed: {str(e)[:120]}", file=sys.stderr)

    # ---------------- large-N four-step (BASELINE config 5) ---------------
    # default: the 2^20 fused-pipeline point; --full adds the full span incl.
    # the 2^21/2^22 tiled-twiddle extension (round-3 session 3)
    for log in ((16, 18, 20, 21, 22) if full else (20,)):
        if over_budget(f"fft-large-2^{log}"):
            break
        try:
            nn = 1 << log
            xs = jnp.asarray(rng.uniform(-1, 1, nn).astype(np.float32))
            ys = jnp.asarray(rng.uniform(-1, 1, nn).astype(np.float32))

            def lstep(c):
                a, bb = c
                a, bb = fft_large(a, bb, inverse=False)
                return fft_large(a, bb, inverse=True)

            def jlstep(c):
                a, bb = c
                z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
                return z.real, z.imag
            t_l, t_jl, ratio, st = paired_chain(
                lstep, (xs, ys), jlstep, (xs, ys),
                reps=_reps(), r1=16, r2=96)
            print(f"  [large] 2^{log} ours={t_l*1e6:,.0f}us "
                  f"jnp={t_jl*1e6:,.0f}us x{ratio:.2f}", file=sys.stderr)
            record(f"watfft/fft-large/f32/n{nn}", t_l, 1,
                   times=st["ours_times"])
            record(f"jnp.fft/fft-large/f32/n{nn}", t_jl, 1,
                   times=st["base_times"])
        except Exception as e:
            print(f"  large 2^{log} bench failed: {str(e)[:120]}",
                  file=sys.stderr)

    # ---------------- public API dispatch point (planner) -----------------
    # VERDICT r1 #3 evidence: the public context API (batch-major planes)
    # must land within ~1.1x of the raw time-major kernel (round-4: the
    # batch-major wrapper folds its transposes into the native 3D layout).
    t_d = 0.0
    if not over_budget("dispatch"):
        try:
            for n in (64, 1024, 4096):
                b = max(128, TOTAL_ELEMS // n)
                ctx = FFTContext(n, "float32")
                xre = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
                xim = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

                def dstep(c, ctx=ctx):
                    a, bb = c
                    a, bb = ctx.forward_planes(a, bb)
                    return ctx.inverse_planes(a, bb)
                t_dn, ts = _solo(dstep, (xre, xim),
                                 floor=_roundtrip_floor(xre.size))
                rel = t_dn / raw_times[n]
                record(f"watfft/dispatch/f32/n{n}", t_dn, b,
                       nbytes=16 * n * b, times=ts)
                print(f"  [dispatch] n={n} b={b}: {2*b/t_dn:,.0f}/s "
                      f"({rel:.2f}x raw kernel time)", file=sys.stderr)
                if n == 1024:
                    t_d = t_dn
        except Exception as e:
            print(f"  dispatch bench failed: {str(e)[:120]}", file=sys.stderr)

    # =======================================================================
    # SECONDARY SURFACE POINTS — alternates and documented negatives, one
    # point each. They run BEFORE the depth sweeps so every registry
    # surface (incl. stockham-bf16 / mxu-dft) is measured even when the
    # driver budget truncates the run (round-5: a 540 s run covered all
    # primary surfaces but expired before these when they were last).
    # =======================================================================

    # ---------------- bf16 interop tier -----------------------------------
    # Documented as the INTEROP tier (PARITY.md): it exists so bf16 pipelines
    # can stay bf16 end-to-end, not to beat the f32 tier (it never has —
    # the snapshot's rel column is the honest record, VERDICT r3 Weak #4).
    if not over_budget("bf16"):
        try:
            for n in ((64, 1024) if full else (1024,)):
                b = max(128, TOTAL_ELEMS // n)
                xre_h = jnp.asarray(
                    rng.uniform(-1, 1, (n, b)).astype(np.float32),
                    jnp.bfloat16)
                xim_h = jnp.asarray(
                    rng.uniform(-1, 1, (n, b)).astype(np.float32),
                    jnp.bfloat16)

                def bstep(c):
                    a, bb = c
                    a, bb = stockham_fft_nb(a, bb, inverse=False)
                    return stockham_fft_nb(a, bb, inverse=True)
                floor_b = _roundtrip_floor(xre_h.size) / 2  # 2-byte planes
                t_b16, ts = _solo(bstep, (xre_h, xim_h), floor=floor_b)
                record(f"watfft/stockham-bf16/bf16/n{n}", t_b16, b, times=ts)
                rel = raw_times.get(n)
                extra = f" ({rel / t_b16:.2f}x the f32 tier)" if rel else ""
                print(f"  [bf16] n={n}: {2*b/t_b16:,.0f}/s{extra}",
                      file=sys.stderr)
                # bf16 COMPUTE tier (Exp 42): butterflies stay bf16 in-kernel
                from watfft_tpu import config as _bcfg
                _bcfg.BF16_COMPUTE = True
                try:
                    t_bc, tcs = _solo(bstep, (xre_h, xim_h), floor=floor_b)
                finally:
                    _bcfg.BF16_COMPUTE = False
                record(f"watfft/stockham-bf16/bf16-compute/n{n}", t_bc, b,
                       times=tcs)
                extrac = f" ({rel / t_bc:.2f}x the f32 tier)" if rel else ""
                print(f"  [bf16-comp] n={n}: {2*b/t_bc:,.0f}/s{extrac}",
                      file=sys.stderr)
        except Exception as e:
            print(f"  bf16 bench failed: {str(e)[:120]}", file=sys.stderr)

    # ---------------- MXU speed tier (VERDICT r2 Weak #3) -----------------
    # WATFFT_MXU_PRECISION=default drops the fourstep's matmuls to
    # single-pass bf16 (~1e-3 rel err, fourstep.py:22-26) — the opt-in fast
    # tier for ML workloads. Measured against the HIGHEST-precision fourstep
    # on the same shapes so the claimed speed/accuracy trade carries a
    # number.
    if not over_budget("speed-tier"):
        try:
            from watfft_tpu import config as _cfg
            n, b = 1024, TOTAL_ELEMS // 1024
            xre = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
            xim = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
            times = {}
            tss = {}
            for prec in ("highest", "default"):
                _cfg.MXU_PRECISION = prec
                ctx_p = FFTContext(n, "float32")

                def fpstep(c, ctx_p=ctx_p):
                    a, bb = c
                    a, bb = ctx_p.forward_planes_fourstep(a, bb)
                    return ctx_p.inverse_planes_fourstep(a, bb)
                times[prec], tss[prec] = _solo(fpstep, (xre, xim))
            _cfg.MXU_PRECISION = "highest"
            t_fast, t_hi = times["default"], times["highest"]
            record(f"watfft/fourstep-mxu/bf16-fast/n{n}", t_fast, b,
                   times=tss["default"])
            print(f"  [speed-tier] n={n} fourstep default={2*b/t_fast:,.0f}/s "
                  f"highest={2*b/t_hi:,.0f}/s ({t_hi/t_fast:.2f}x faster at "
                  f"~1e-3 rel err)", file=sys.stderr)
        except Exception as e:
            from watfft_tpu import config as _cfg
            _cfg.MXU_PRECISION = "highest"
            print(f"  speed-tier bench failed: {str(e)[:120]}",
                  file=sys.stderr)

    # ---------------- small-N MXU alternative -----------------------------
    # Kept registered + benched as the honest negative record: it loses to
    # the Stockham kernel at every measured size (Exp 43 logs the dead end;
    # the planner never dispatches it).
    if not over_budget("mxu-dft"):
        try:
            from watfft_tpu.ops.mxu_dft import dft_matmul_nb
            n, b = 64, TOTAL_ELEMS // 64
            xre = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
            xim = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))

            def mstep(c):
                a, bb = c
                a, bb = dft_matmul_nb(a, bb, inverse=False)
                return dft_matmul_nb(a, bb, inverse=True)
            t_m, ts = _solo(mstep, (xre, xim))
            record(f"watfft/mxu-dft/f32/n{n}", t_m, b, times=ts)
            print(f"  [mxu-dft] n={n}: {2*b/t_m:,.0f}/s "
                  f"(vs stockham {2*b/raw_times[n]:,.0f}/s)", file=sys.stderr)
        except Exception as e:
            print(f"  mxu-dft bench failed: {str(e)[:120]}", file=sys.stderr)

    # =======================================================================
    # DEPTH SWEEPS — per-size breadth on already-covered surfaces, LAST by
    # design (VERDICT r4 #3): a budget truncation here costs table rows,
    # not surface coverage. The convenience row (not a registry surface)
    # closes the run.
    # =======================================================================

    # ---------------- standalone inverse directions (VERDICT r2 Missing #3)
    # The reference benches inverse complex and inverse real as first-class
    # surfaces (benchmarks/ifft_f32_dual.bench.js, irfft_f32_dual.bench.js)
    # and claims forward/inverse parity for the native inverse
    # (README.md:53). [cinv]: one chain step = ONE inverse transform (the
    # carry stays spectrum planes). inv/fwd reports the parity ratio.
    for n in ((1024, 4096) if full else (4096,)):
        if over_budget(f"cinv-{n}"):
            break
        try:
            b = max(128, TOTAL_ELEMS // n)
            hr = rng.uniform(-1, 1, (n, b)).astype(np.float32)
            hi = rng.uniform(-1, 1, (n, b)).astype(np.float32)
            if n <= 2048 and b % 1024 == 0:  # native 3D layout (Exp 38)
                hr = hr.reshape(n, 8, b // 8)
                hi = hi.reshape(n, 8, b // 8)
            xre_t = jnp.asarray(hr)
            xim_t = jnp.asarray(hi)

            def istep(c):
                a, bb = c
                return stockham_fft_nb(a, bb, inverse=True)

            def fstep_only(c):
                a, bb = c
                return stockham_fft_nb(a, bb, inverse=False)
            xre = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
            xim = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

            def jistep(c):
                a, bb = c
                z = jnp.fft.ifft(a + 1j * bb)
                return z.real, z.imag
            floor1 = _roundtrip_floor(xre_t.size) / 2  # single direction
            t_i, t_ji, ratio, st = paired_chain(
                istep, (xre_t, xim_t), jistep, (xre, xim),
                reps=_reps(), floor_ours=floor1)
            t_f, _ = _solo(fstep_only, (xre_t, xim_t), floor=floor1)
            nbytes = 8 * n * b  # one direction = 2 duplex plane-passes
            record(f"watfft/stockham-pallas/f32-inv/n{n}", t_i, b, items=1,
                   nbytes=nbytes, times=st["ours_times"])
            record(f"jnp.fft/f32-inv/n{n}", t_ji, b, items=1, nbytes=nbytes,
                   times=st["base_times"])
            print(f"  [cinv] n={n:<6} ours={b/t_i:,.0f}/s jnp={b/t_ji:,.0f}/s "
                  f"x{ratio:.2f}  inv/fwd={t_i/t_f:.2f}", file=sys.stderr)
        except Exception as e:
            print(f"  cinv bench failed: {str(e)[:120]}", file=sys.stderr)

    # ---------------- real path depth: the remaining eight sizes ----------
    for n in SIZES:
        if n == 1024:  # representative point already measured above
            continue
        if over_budget(f"real-{n}"):
            break
        try:
            bench_real_size(n)
        except Exception as e:
            print(f"  real n={n} bench failed: {str(e)[:120]}",
                  file=sys.stderr)
    if real_speedups:
        rg = math.exp(sum(map(math.log, real_speedups)) / len(real_speedups))
        print(f"  [real] geomean over {len(real_speedups)} sizes: x{rg:.2f}",
              file=sys.stderr)

    # ---------------- extended kernel sizes (beyond the BASELINE sweep) ---
    # The former 8192-32768 "crossover valley" (VERDICT r2 Missing #2):
    # each size runs through whatever the PLANNER dispatches (so the bench
    # tracks dispatch retunes automatically). --full only: the planner's
    # crossovers are re-validated when they change, not per driver run.
    for n in ((8192, 16384, 32768) if full else ()):
        try:
            b = max(128, TOTAL_ELEMS // n)
            xre_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
            xim_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
            kname = _planner.c2c_kernel(n, "float32")
            surf = {"stockham": "stockham-pallas"}.get(kname, kname)

            if kname == "stockham":
                def pstep(c):
                    a, bb = c
                    a, bb = stockham_fft_nb(a, bb, inverse=False)
                    return stockham_fft_nb(a, bb, inverse=True)
            else:
                def pstep(c):
                    a, bb = c
                    a, bb = fft_large_nb(a, bb, inverse=False)
                    return fft_large_nb(a, bb, inverse=True)
            xre = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
            xim = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

            def jstep2(c):
                a, bb = c
                z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
                return z.real, z.imag
            t_x, t_jx, ratio, st = paired_chain(
                pstep, (xre_t, xim_t), jstep2, (xre, xim),
                reps=_reps(), floor_ours=_roundtrip_floor(xre_t.size))
            nbytes = 16 * n * b
            record(f"watfft/{surf}/f32/n{n}", t_x, b, nbytes=nbytes,
                   times=st["ours_times"])
            record(f"jnp.fft/f32/n{n}", t_jx, b, nbytes=nbytes,
                   times=st["base_times"])
            print(f"  [ext] n={n:<6} ours({surf})={2*b/t_x:,.0f}/s "
                  f"jnp={2*b/t_jx:,.0f}/s x{ratio:.2f}",
                  file=sys.stderr)
        except Exception as e:
            print(f"  ext n={n} bench failed: {str(e)[:120]}", file=sys.stderr)

    # ---------------- convenience-path tax (VERDICT r2 Weak #5) -----------
    # fftlib.fft / ctx.forward take complex dtypes, which the axon tunnel
    # cannot transfer — each call pays a host round-trip
    # (api._complex_via_host) and cannot chain under jit. Measured as raw
    # wall-clock per call (run_benchmark, includes the ~28 ms tunnel RPC
    # where present) vs the plane dispatch point's chained per-call time, so
    # users see exactly what the split-plane API buys.
    if not over_budget("convenience"):
        try:
            from watfft_tpu import fftlib
            n, b = 1024, 2048
            zc = (rng.uniform(-1, 1, (b, n)) +
                  1j * rng.uniform(-1, 1, (b, n))).astype(np.complex64)
            conv = run_benchmark("watfft/convenience-fftlib/c64/n1024",
                                 lambda: fftlib.fft(zc), items_per_call=b,
                                 num_samples=5)
            results.append(conv)
            t_conv = conv.items_per_call / conv.ops_per_sec / b
            tax = t_conv / (t_d / 2) if t_d else float("nan")
            print(f"  [convenience] n={n} b={b}: fftlib.fft "
                  f"{conv.ops_per_sec:,.0f}/s "
                  f"({tax:,.0f}x the chained plane-dispatch per-call time — "
                  f"the host-round-trip tax)", file=sys.stderr)
        except Exception as e:
            print(f"  convenience bench failed: {str(e)[:120]}",
                  file=sys.stderr)

    try:
        # Neither a truncated run nor a budget-mode (non --full) run may
        # clobber the committed full snapshot: test_meta asserts every
        # surface has a row in it AND the README table is derived from it
        # (test_readme_table_matches_snapshot) — a driver-budget run
        # overwriting it would silently redden both. Budget runs get
        # their own id; --full owns headline.latest.json.
        if truncated:
            bench_id = "headline.partial"
        elif full:
            bench_id = "headline"
        else:
            bench_id = "headline.default"
        path = save_results(bench_id, results)
        print(f"saved: {path} "
              f"({time.perf_counter()-t_start:.0f}s total"
              + (f", {len(truncated)} sections skipped" if truncated else "")
              + ")", file=sys.stderr)
    except Exception as e:
        print(f"save failed: {e}", file=sys.stderr)


def main_cpu() -> None:
    """Second-runtime bench rows (VERDICT r3 Missing #4): the analog of the
    reference's browser benches, which exist because a stale second-runtime
    bench once mis-reported for two generations (wat-surfaces.mjs:13-17).
    Times the PUBLIC planner-dispatched path on the CPU/XLA backend — where
    the planner dispatches 'xla-fft' (the platform's native FFT through our
    plane API; round-5: the four-step matmul path measured 0.18-0.24x jnp
    on CPU, so the FFTW-planner answer is the native library) — against
    jnp.fft AND scipy.fft (pocketfft) on the same host, with the same
    chain-slope harness for the jnp pair and wall-clock batching for scipy
    (a host library has no XLA chain; its per-call number includes exactly
    the work a scipy user pays). The explicit four-step surface gets its
    own row so the portable path stays measured on the second runtime.
    scipy's correctness is validated by tests/test_meta.py (the reference
    validates every competitor, third-party-correctness.test.js:10-16).
    Saves headline-cpu.latest.json; CI runs this as its bench smoke (the
    reference's 30 s ci.yml pattern)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from watfft_tpu.api import FFTContext
    from watfft_tpu.bench.harness import (save_results, BenchResult,
                                          paired_chain, run_benchmark,
                                          enable_compile_cache)
    enable_compile_cache()
    rng = np.random.default_rng(7)
    results, ratios = [], []
    try:
        import scipy.fft as sfft
    except ImportError:  # scipy is baked into the image; belt-and-braces
        sfft = None
    for n in (256, 1024):
        b = 512
        ctx = FFTContext(n, "float32")
        xre = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
        xim = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

        def dstep(c, ctx=ctx):
            a, bb = c
            a, bb = ctx.forward_planes(a, bb)
            return ctx.inverse_planes(a, bb)

        def jstep(c):
            a, bb = c
            z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
            return z.real, z.imag
        def fstep(c, ctx=ctx):
            a, bb = c
            a, bb = ctx.forward_planes_fourstep(a, bb)
            return ctx.inverse_planes_fourstep(a, bb)

        t_o, t_b, ratio, st = paired_chain(dstep, (xre, xim), jstep,
                                           (xre, xim), reps=_reps(), r1=4, r2=24,
                                           target_s=0.03)
        ratios.append(ratio)
        from watfft_tpu.bench.harness import time_chain as _tc
        t_fs = _tc(fstep, (xre, xim), r1=4, r2=24, target_s=0.03)
        for nm, t, ts in ((f"watfft-cpu/dispatch/f32/n{n}", t_o,
                           st["ours_times"]),
                          (f"watfft-cpu/fourstep-mxu/f32/n{n}", t_fs, [t_fs]),
                          (f"jnp.fft-cpu/f32/n{n}", t_b, st["base_times"])):
            import statistics as _st
            m = _st.fmean(ts)
            results.append(BenchResult(
                name=nm, ops_per_sec=2 * b / t, batch=b,
                items_per_call=2 * b, samples=[round(2 * b / x, 1) for x in ts],
                cv=round(_st.pstdev(ts) / m, 4) if m > 0 else 0.0))
        line = (f"  [cpu] n={n} ours={2*b/t_o:,.0f}/s jnp={2*b/t_b:,.0f}/s "
                f"x{ratio:.2f}")
        if sfft is not None:
            # scipy.fft (pocketfft): the validated second competitor
            # (VERDICT r4 #6). Batched c64 roundtrip per call, same shapes.
            zc = (np.asarray(xre) + 1j * np.asarray(xim)).astype(np.complex64)
            sres = run_benchmark(
                f"scipy.fft-cpu/f32/n{n}",
                lambda: sfft.ifft(sfft.fft(zc, axis=-1), axis=-1),
                items_per_call=2 * b, num_samples=5)
            results.append(sres)
            line += f" scipy={sres.ops_per_sec:,.0f}/s"
        print(line, file=sys.stderr)
    geo = math.exp(sum(map(math.log, ratios)) / len(ratios))
    try:
        path = save_results("headline-cpu", results)
        print(f"saved: {path}", file=sys.stderr)
    except Exception as e:
        print(f"save failed: {e}", file=sys.stderr)
    print(json.dumps({
        "metric": "cpu-backend dispatch vs jnp.fft geomean (second runtime)",
        "value": round(geo, 4),
        "unit": "x",
        "vs_baseline": round(geo, 4),
    }))


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        main_cpu()
    else:
        main(full="--full" in sys.argv)
