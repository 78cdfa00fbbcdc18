"""Runtime tunables (env-overridable) — the framework's flag system.

Reference analog: per-module constants as WAT globals + the npm-scripts
matrix (SURVEY.md §5 "Config / flag system"). Every knob has a measured
default (docs/EXPERIMENT_LOG.md); env vars exist for experiments and for
future hardware generations, not for routine use.

  WATFFT_VMEM_LIMIT_MB   scoped VMEM limit for Pallas kernels (default 100)
  WATFFT_USE3D_MAX_N     largest n using the 3D small-n layout (default 128)
  WATFFT_DIRECT_MAX      largest DFT-matmul factor in the MXU surface (128)
  WATFFT_STOCKHAM_MAX_N  largest n the planner sends to the Stockham kernel
  WATFFT_RFFT_MAX_N      largest n the planner sends to the Pallas real path
  WATFFT_INTERPRET       force Pallas interpret mode (debugging / CPU CI
                         coverage of the dispatch branch)
  WATFFT_DF_MAX_RADIX    largest stage radix in the double-f32 plan
                         (default 16 on TPU — Exp 16: 3.3x faster than
                         radix-4 on chip; 4 elsewhere — the radix-16 df
                         expression costs ~50s to trace+compile per size on
                         CPU vs ~15s for radix-4, Exp 18)
"""

from __future__ import annotations

import os


def _int_env(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


VMEM_LIMIT_BYTES = _int_env("WATFFT_VMEM_LIMIT_MB", 100) * 1024 * 1024
# MXU precision ladder for the four-step matmul surface: "highest" (default,
# multi-pass bf16 = near-f32, ~1e-7) or "default" (single-pass bf16, ~1e-3 —
# the opt-in fast tier for ML workloads where activations are bf16 anyway).
# Read at trace time: set before creating contexts / first call per shape.
MXU_PRECISION = os.environ.get("WATFFT_MXU_PRECISION", "highest")
USE3D_MAX_N = _int_env("WATFFT_USE3D_MAX_N", 256)  # Exp 21: 256@tile1024 69->57us
# largest n accepting the native sublane-folded [n, 8, W] plane layout
# (3D block specs: the lane->sublane relayout rides the HBM->VMEM DMA, and
# chained calls skip the 2D<->3D boundary relayout — Exp 28: pure-3D
# roundtrips 24.5/36.5/37/35.7/46.5us at n=16/32/64/128/256 vs 55-77us
# through 2D). Round-3 Exp 38 re-probed the upper crossover: 3D KEEPS
# winning at 512/1024/2048 (55.9/56.3/60.7us vs 78/77/88 through 2D,
# 1.4x), so the cap is 2048 — bounded by W = batch/8 needing a full
# 128-lane tile, not by kernel economics. Also gates the real path's 3D
# mode at m = n/2 (Exp 37).
DMA3D_MAX_N = _int_env("WATFFT_DMA3D_MAX_N", 2048)
# Sizes where the batch-major DISPATCH path (api._bm_stockham: XLA
# boundary transposes around the kernel) should still fold into the 3D
# layout. Exp 44 follow-up (tools/probe_bm2.py, paired, ratios are time vs
# the raw-3D native chain): BEHIND a transpose the fold wins only at n=16
# (1.46x vs 1.95x through 2D) and n=2048 (1.02x vs 1.12x); at
# 32/64/256/512/1024 the 2D kernel path is faster (1.85/1.72/1.40/1.51/
# 1.22x vs 2.17/1.87/1.95/1.71/1.40x) — the fold's relayout does NOT ride
# the transpose for free. Distinct from DMA3D_MAX_N, which governs the
# NATIVE-LAYOUT chained path where 3D keeps winning through 2048 (Exp 38).
DISPATCH_3D_SIZES = frozenset(
    int(s) for s in os.environ.get(
        "WATFFT_DISPATCH_3D_SIZES", "16,2048").split(",") if s)
DIRECT_MAX = _int_env("WATFFT_DIRECT_MAX", 128)
# 16384 = largest n whose ~17-plane VMEM live set still compiles at tile 128
# (Exp 20: 8192 beats jnp 2.31x and the four-step 2.6x; 16384 wins 1.39x)
STOCKHAM_MAX_N = _int_env("WATFFT_STOCKHAM_MAX_N", 16384)
# largest n the planner sends to the batched four-step (fused stage-2): at
# n=2^21 the split is n1=2048 and the stage-2 kernel's ~17 [n1, 1024] f32
# live planes (~143MB) exceed the VMEM limit — beyond this the XLA four-step
# path takes over (ADVICE r2 planner cap)
LARGE_NB_MAX_N = _int_env("WATFFT_LARGE_NB_MAX_N", 1 << 20)
# Past the fused pipeline's ceiling the 2D tiled-twiddle four-step path
# (fft_large_nb's b % 128 != 0 branch) still wins for single/small-batch
# transforms: 1.27x at 2^21 and 1.78x at 2^22 vs jnp on chip, where the
# XLA fourstep only ties (1.00x) — round-3 session-3 probe
# (tools/probe_large22.py). The fused pipe2 itself CANNOT extend there:
# tbk=4 violates Mosaic's sublane divisibility on the [n1, tbk, 128]
# output block and tbk=8 crashes the compiler at n1=1024/n2=2048.
LARGE_2D_MAX_N = _int_env("WATFFT_LARGE_2D_MAX_N", 1 << 22)
# The 2D path pre-tiles the four-step twiddle across the in-column batch
# ([n2, n1*b] host arrays); cap its footprint so dispatch never builds a
# multi-GB table (b_max = cap / (n * 8 bytes): 4 at 2^21, 2 at 2^22).
TILED_TW_CAP_BYTES = _int_env("WATFFT_TILED_TW_CAP_MB", 64) * 1024 * 1024
# Crossover points measured on chip (round-3 valley probe, Exp 31):
#   8192:  cube(128x64)  2.59x  vs stockham 2.13x, pipe2 1.98x
#   16384: cube(128x128) 2.22x  vs stockham 1.14x, pipe2 1.35x
#   32768: pipe2(128x256) 2.18x; the cube FAILS TO COMPILE (16MB/plane,
#          live set over the VMEM limit), hence CUBE_MAX_N = 2^14
#   65536: pipe2(256x256) 2.54x
# smallest n the planner hands to the batched four-step (below this the
# single Stockham kernel wins; at/above, the cube/pipe2 four-step does)
LARGE_NB_MIN_N = _int_env("WATFFT_LARGE_NB_MIN_N", 1 << 13)
# largest n taking the single-kernel "cube" four-step (whole [n2, n1, 128]
# transform resident in VMEM — 4 HBM passes vs the pipeline's 8)
CUBE_MAX_N = _int_env("WATFFT_CUBE_MAX_N", 1 << 14)
RFFT_PALLAS_MAX_N = _int_env("WATFFT_RFFT_MAX_N", 16384)  # m=8192 core, Exp 20
# Sizes where the single-pass fused real kernel (blocked MXU mirror, Exp 32)
# measured FASTER than the partial-fusion hybrid on chip — the per-size
# codelet-table pattern (reference: fft_real_f32_dual.wat:2433-2459,
# re-validated per hardware generation). Round-3 revision (Exp 35): the
# table is PER-DIRECTION, measured on standalone direction chains with
# unprunable consumers (a [0,0]-scalar consumer lets XLA slice the hybrid's
# post-process to one element, faking a 2-4x hybrid "win"). Forward
# fused/hybrid: 16: 0.53, 64: 0.59, 256: 1.00, 1024: 1.09, 4096: 0.69.
# Round-4 re-probe AFTER the Exp 39 radix replans (Exp 41,
# tools/probe_mirror_lc.py — the hybrid's core got faster at some sizes
# and slower at others, moving the crossovers): forward fused wins grew to
# 256 (20.6us vs hybrid 33.3) and 2048 (65.3 vs 97.1); 128/512/1024 stay
# hybrid (hybrid 25.5/45.7/42.2us vs fused 29.8/45.1/53.8).
# Round-5 re-probe AFTER the Exp 47 bf16x3 mirror (tools/probe_rsel.py on
# chip, 2026-08-20 — the fused kernels' Hermitian mirror got ~2x cheaper,
# moving the crossovers again, exactly Exp 38's re-probe lesson): forward
# fused now also wins 128 (34.2us vs hybrid 39.5), 512 (39.1 vs 47.7) and
# 8192 (57.4 vs 197.8 — with MXU select); 256 is a tie (38.8 vs 38.3,
# inside the noise gate — kept), 1024 stays hybrid (39.6 vs 47.6).
# Inverse: the fused inverse beats the hybrid for the FIRST time at 1024
# (26.6us vs 47.5, both with MXU select; hybrid-parity 63.8) — every
# other size stays hybrid (fused 45.6-61.0 vs hybrid 37.5-52.5).
RFFT_FUSED_FWD_SIZES = frozenset(
    int(s) for s in os.environ.get(
        "WATFFT_RFFT_FUSED_FWD_SIZES",
        "16,32,64,128,256,512,2048,4096,8192").split(",")
    if s)
RFFT_FUSED_INV_SIZES = frozenset(
    int(s) for s in os.environ.get(
        "WATFFT_RFFT_FUSED_INV_SIZES", "1024").split(",") if s)
# bf16 COMPUTE tier (round-3 headroom d): when set, bfloat16 planes run
# the Stockham butterflies in bf16 end-to-end (bf16 twiddles, weak-typed
# codelet constants) instead of converting to f32 at the kernel boundary.
# Accuracy ~1e-2 (8-bit mantissa over log stages) — a speed/precision
# trade the caller opts into per-process; default off keeps the bf16
# INTEROP tier's f32-butterfly accuracy (~4e-3).
BF16_COMPUTE = os.environ.get(
    "WATFFT_BF16_COMPUTE", "") not in ("", "0", "false")

# Lane-concat mirror (Exp 41): realize the fused kernels' Hermitian mirror
# as ONE [G, G] @ [G, 2*nb*tile_b] matmul (re+im and all row blocks
# concatenated on the lane axis) instead of 2*nb separate [G, G] dots.
# MEASURED NEGATIVE as a default (Exp 41 paired probe: lane-concat vs
# per-block within +-10% at 512-4096 and LOSES at 128-256 — it never flips
# a dispatch decision), so the default set is EMPTY and the variant is
# opt-in via env for future hardware; n in this set flips the fused
# kernels to _mirror_rows_many.
RFFT_MIRROR_LC_SIZES = frozenset(
    int(s) for s in os.environ.get(
        "WATFFT_RFFT_MIRROR_LC_SIZES", "").split(",") if s)
# MXU selection dots for the 2D real path's deinterleave (forward) /
# reinterleave (inverse) — Exp 47: Mosaic lowers the [m, 2, b] parity view
# as per-row sublane selects, costing 3.53x the whole m=2048 core at
# [4096, 512]; blocked 0/1 matmuls in the exact 3-pass bf16x3 form cut the
# roundtrip tax to 1.51x (tools/probe_real4096f.py). The result is
# bit-exact at the op level; end-to-end the two program variants differ
# <= 2 ulp from compiler FMA-contraction of the surrounding stages — the
# same accuracy surface as any recompile (see _sel_dot; pinned per
# direction and family by tests/test_mxu_select.py). Per-size, PER-DIRECTION tables
# measured on chip (tools/probe_rsel.py, 2026-08-20, full table in
# docs/EXPERIMENT_LOG.md Exp 47): forward MXU wins 2048-16384 (e.g. 4096:
# fused-mxu 50.6us vs fused-parity 70.6 vs hybrid-parity 139.2); inverse
# MXU wins 512-16384 (e.g. 4096: hybrid-mxu 47.0us vs hybrid-parity 59.3).
# Below those sizes the parity select is already cheaper than the extra
# MXU passes (128-256: mxu loses 12-34%). Only the 2D [n, batch] layout
# consults them — the 3D native layout's split rides a major dim for free.
RFFT_MXU_SELECT_FWD_SIZES = frozenset(
    int(s) for s in os.environ.get(
        "WATFFT_RFFT_MXU_SELECT_FWD_SIZES",
        "2048,4096,8192,16384").split(",") if s)
RFFT_MXU_SELECT_INV_SIZES = frozenset(
    int(s) for s in os.environ.get(
        "WATFFT_RFFT_MXU_SELECT_INV_SIZES",
        "512,1024,2048,4096,8192,16384").split(",") if s)
FORCE_INTERPRET = os.environ.get("WATFFT_INTERPRET", "") not in ("", "0", "false")


def df_max_radix() -> int:
    """Resolved lazily (importing jax at config-import time is too early):
    radix-16 df stages on a real TPU backend, radix-4 under interpret/CPU.
    Same stage machinery and accuracy either way (Exp 18: 6.9e-15 both)."""
    env = os.environ.get("WATFFT_DF_MAX_RADIX")
    if env:
        return int(env)
    import jax

    on_tpu = not FORCE_INTERPRET and jax.default_backend() == "tpu"
    return 16 if on_tpu else 4
