"""Kernel dispatch — the FFTW-planner-lite.

The reference always runs the best implementation for a size from its public
entry points (auto radix dispatch fft_combined.wat:727-732; the per-size
codelet table fft_real_f32_dual.wat:2433-2459, re-validated per hardware
generation). This module is the TPU analog: a static decision table, derived
from on-chip measurements (docs/EXPERIMENT_LOG.md Exp 17/18), that the public
context API consults so `watfft_tpu.fft(x)` always runs the headline kernel.

Decision table (f32, TPU backend):

  layout        n range            kernel
  ------------  -----------------  ------------------------------------------
  time-major    2 .. 16384         Pallas mixed-radix Stockham (VPU)
  batch-major   2 .. 16384         XLA transpose -> Stockham -> transpose
                                   (Exp 18: chained calls cancel interior
                                   transposes; 2.7-3.2x vs jnp even with the
                                   wrapper, vs 0.65-0.78x for the einsum path)
  any           > 16384            four-step MXU matmul decomposition (XLA)
                                   (Exp 20: the kernel wins 2.31x at 8192 and
                                   1.39x at 16384; its VMEM live set caps it)

  real (rfft)   8 .. 16384         Pallas real path: single-pass fused kernel
                                   at the per-size, PER-DIRECTION codelet-table
                                   sizes where it measured faster
                                   (config.RFFT_FUSED_{FWD,INV}_SIZES,
                                   Exp 32/35), partial-fusion hybrid elsewhere
                otherwise          XLA pack-as-complex + Hermitian post

f64 always takes the four-step XLA path here (CPU device on TPU backends);
the TPU-native f64 tier is the double-f32 kernel, reachable through the
time-major `*_planes_nb` entry points — its host-side hi/lo split makes it
unsuitable for transparent dispatch inside traced code.

Pallas kernels are only dispatched when they can actually run: on a TPU
backend, or anywhere under WATFFT_INTERPRET=1 (lets CPU CI exercise the
dispatch branch in interpret mode).
"""

from __future__ import annotations

import jax

from . import config
from .plan import is_power_of_two

__all__ = ["pallas_available", "native_backend_fft", "c2c_kernel",
           "r2c_kernel"]


def pallas_available() -> bool:
    return config.FORCE_INTERPRET or jax.default_backend() == "tpu"


def native_backend_fft() -> bool:
    """Non-TPU backends (the CPU second runtime, GPUs): the platform's own
    XLA FFT (pocketfft/ducc on CPU) is the fastest implementation
    available — the round-5 CPU bench measured the four-step matmul path
    at 0.18-0.24x jnp.fft there (bench.py --cpu), which is exactly the
    FFTW-planner situation where the right plan is the native library.
    The public API dispatches to it ('xla-fft') so switching from jnp.fft
    costs nothing on CPU while the same code runs the Pallas kernels on
    TPU. Interpret mode opts out so CI still exercises the Pallas
    dispatch branches."""
    return not config.FORCE_INTERPRET and jax.default_backend() != "tpu"


def c2c_kernel(n: int, dtype: str, batch: int | None = None) -> str:
    """'stockham' (Pallas VPU kernel), 'large-nb' (batched four-step with
    both factor FFTs on the Pallas kernel — round-2 Exp 22: the XLA einsum
    path LOST to jnp at n=32768, x0.75), or 'fourstep' (XLA MXU matmuls).

    batch: the transform batch the caller will pass (post any padding).
    Only consulted in the 2^21-2^22 range, where the Pallas path survives
    solely as the 2D tiled-twiddle four-step (fft_large_nb's b % 128 != 0
    branch — the fused pipeline cannot compile there, config.LARGE_2D_MAX_N
    note): dispatched only when the pre-tiled twiddle stays within
    config.TILED_TW_CAP_BYTES. batch=None means unknown -> conservative
    'fourstep' in that range.

    On non-TPU backends the answer is 'xla-fft' (native_backend_fft):
    jnp.fft through the same public API, any size."""
    if native_backend_fft():
        return "xla-fft"
    if dtype == "float32" and pallas_available() and is_power_of_two(n):
        # Small-n note: 'mxu-dft' (whole transform as one MXU matmul) is
        # deliberately NEVER dispatched — it measured 0.56-0.62x the VPU
        # Stockham kernel at every n <= 128 (Exp 17: HIGHEST-precision
        # matmul passes cost more than the permutes they replace); it stays
        # registered + benched so the negative re-validates per hardware
        # generation.
        # Round-3 crossover (config.py table): the four-step overtakes the
        # single kernel at 2^13 — cube 2.59x vs stockham 2.13x at 8192,
        # 2.22x vs 1.14x at 16384.
        if 2 <= n < min(config.LARGE_NB_MIN_N,
                        config.STOCKHAM_MAX_N + 1):
            return "stockham"
        # Fused-pipeline domain: beyond 2^20 the stage-2 kernel's VMEM live
        # set (~17 [n1, tile] f32 planes at n1=2048) exceeds
        # VMEM_LIMIT_BYTES and fails to compile (ADVICE r2).
        if config.LARGE_NB_MIN_N <= n <= config.LARGE_NB_MAX_N:
            return "large-nb"
        if n <= config.STOCKHAM_MAX_N:
            return "stockham"
        # 2^21-2^22: single/small-batch transforms ride the 2D tiled path
        # (1.27x/1.78x vs jnp on chip; the XLA fourstep ties at 1.00x)
        if (n <= config.LARGE_2D_MAX_N and batch is not None
                and batch % 128 != 0
                and batch * n * 8 <= config.TILED_TW_CAP_BYTES):
            return "large-nb"
    return "fourstep"


def r2c_kernel(n: int, dtype: str, direction: str = "forward") -> str:
    """'rfft-pallas-fused' (single-pass fused kernel with the blocked MXU
    mirror — dispatched at the sizes where it measured faster, the per-size
    codelet-table pattern of the reference's
    fft_real_f32_dual.wat:2433-2459), 'rfft-pallas' (partial-fusion hybrid),
    or 'fourstep'. The fused table is PER-DIRECTION and re-probed whenever
    shared machinery changes (Exp 35 -> Exp 41 -> Exp 47: after the bf16x3
    mirror the fused forward wins at 16-512 and 2048-8192, and the fused
    inverse wins at 1024 — its first entry; config.RFFT_FUSED_* cite the
    numbers). On non-TPU backends: 'xla-fft' (native_backend_fft)."""
    if native_backend_fft():
        return "xla-fft"
    if dtype == "float32" and pallas_available() and is_power_of_two(n):
        if 8 <= n <= config.RFFT_PALLAS_MAX_N:
            fused = (config.RFFT_FUSED_FWD_SIZES if direction == "forward"
                     else config.RFFT_FUSED_INV_SIZES)
            if n in fused:
                return "rfft-pallas-fused"
            return "rfft-pallas"
        # past the Stockham kernel's ceiling: pack-as-complex on the batched
        # four-step core (m = n/2 in large-nb's domain) — the reference's
        # real path stops at 16K points entirely
        if config.RFFT_PALLAS_MAX_N < n <= 2 * config.LARGE_NB_MAX_N:
            return "rfft-large"
    return "fourstep"
