"""Surface registry — the single source of truth for benchmarkable kernels.

Port of benchmarks/shared/wat-surfaces.mjs (reference), which exists because a
stale benchmark once mis-reported results for two generations
(wat-surfaces.mjs:13-17). Every kernel implementation must be registered here;
the coverage meta-test (tests/test_meta.py, reference analog
tests/benchmark-coverage.test.js) enforces that every entry passes a DFT
spot-check and that every public surface has a flagship, so no kernel can
silently escape testing or benchmarking.

Surfaces (reference: wat-surfaces.mjs:50-184): complex-forward,
complex-inverse, real-forward, real-inverse — each × {float32, float64}.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

__all__ = ["SurfaceEntry", "REGISTRY", "SURFACES", "entries", "flagship"]

SURFACES = ("complex-forward", "complex-inverse", "real-forward", "real-inverse")


@dataclass(frozen=True)
class SurfaceEntry:
    name: str          # implementation name
    surface: str       # one of SURFACES
    dtype: str         # float32 | float64 | bfloat16 (fast tier)
    min_size: int
    max_size: int
    flagship: bool     # the implementation dispatched by the public API
    baseline: bool     # competitor/baseline (jnp.fft), never flagship
    make: Callable[[int], Callable[[np.ndarray], np.ndarray]]
    # make(n) -> transform: batched host/jnp array [..., n-ish] -> result array


def _ctx_cached(kind: str):
    from . import api
    cache: dict = {}

    def get(n: int, dtype: str):
        key = (n, dtype)
        if key not in cache:
            cache[key] = (api.FFTContext if kind == "c2c" else api.RFFTContext)(n, dtype)
        return cache[key]

    return get


_get_c2c = _ctx_cached("c2c")
_get_r2c = _ctx_cached("r2c")


def _mk(kind: str, direction: str, dtype: str, dispatched: bool = False):
    """Context-API surface, adapted to split-plane host I/O: complex dtypes
    never cross host<->device (the axon TPU tunnel cannot transfer them, and
    eager complex ops fail outside jit).

    dispatched=True runs the planner-dispatched public entry points (the
    flagship surface); dispatched=False pins the explicit four-step XLA
    path so the registry keeps testing it directly."""
    def make(n: int):
        ctx = (_get_c2c if kind == "c2c" else _get_r2c)(n, dtype)
        rdt = np.float64 if dtype == "float64" else np.float32

        def run(x):
            x = np.asarray(x)
            if kind == "c2c":
                if direction == "forward":
                    fn = ctx.forward_planes if dispatched else ctx.forward_planes_fourstep
                else:
                    fn = ctx.inverse_planes if dispatched else ctx.inverse_planes_fourstep
                re, im = fn(np.ascontiguousarray(x.real, dtype=rdt),
                            np.ascontiguousarray(x.imag, dtype=rdt))
                return np.asarray(re) + 1j * np.asarray(im)
            if direction == "forward":
                fn = ctx.forward_planes if dispatched else ctx.forward_planes_fourstep
                re, im = fn(np.ascontiguousarray(x.real, dtype=rdt))
                return np.asarray(re) + 1j * np.asarray(im)
            fn = ctx.inverse_planes if dispatched else ctx.inverse_planes_fourstep
            return np.asarray(fn(
                np.ascontiguousarray(x.real, dtype=rdt),
                np.ascontiguousarray(x.imag, dtype=rdt)))
        return run
    return make


def _mk_jnp_fft(surface: str, dtype: str):
    """jnp.fft baseline — the flagship competitor (SURVEY.md §4 tier 7:
    'verify jnp.fft baselines are configured fairly'). Full transform
    including any layout conversion, matching how our surfaces are charged.
    Complex stays strictly inside the jit (real-plane signatures): the axon
    TPU tunnel cannot transfer complex arrays host<->device and eager
    complex ops fail outside jit."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _fft_planes(re, im):
        y = jnp.fft.fft(re + 1j * im)
        return y.real, y.imag

    @jax.jit
    def _ifft_planes(re, im):
        y = jnp.fft.ifft(re + 1j * im)
        return y.real, y.imag

    @jax.jit
    def _rfft_planes(re):
        y = jnp.fft.rfft(re)
        return y.real, y.imag

    def make(n: int):
        rdt = np.float64 if dtype == "float64" else np.float32

        def planes(x):
            x = np.asarray(x)
            return (np.ascontiguousarray(x.real, dtype=rdt),
                    np.ascontiguousarray(x.imag, dtype=rdt))

        if surface == "complex-forward":
            def run(x):
                re, im = _fft_planes(*planes(x))
                return np.asarray(re) + 1j * np.asarray(im)
        elif surface == "complex-inverse":
            def run(x):
                re, im = _ifft_planes(*planes(x))
                return np.asarray(re) + 1j * np.asarray(im)
        elif surface == "real-forward":
            def run(x):
                re, im = _rfft_planes(np.asarray(x).astype(rdt))
                return np.asarray(re) + 1j * np.asarray(im)
        else:
            @jax.jit
            def _irfft_planes(re, im):
                return jnp.fft.irfft(re + 1j * im, n=n)

            def run(x):
                return np.asarray(_irfft_planes(*planes(x)))
        return run
    return make


def _mk_stockham(direction: str):
    """Pallas Stockham kernel surface (f32, time-major). The adapter
    transposes [batch, n] <-> [n, batch] and pads the batch to 128 lanes so
    registry-driven tests exercise the kernel; perf runs use the native
    [n, batch] layout directly (ops/pallas_stockham.py)."""
    import jax.numpy as jnp
    from .ops.pallas_stockham import stockham_fft_nb

    def make(n: int):
        def run(x):
            x = np.asarray(x)
            squeeze = x.ndim == 1
            x = np.atleast_2d(x).astype(np.complex64)
            b = x.shape[0]
            bp = max(128, ((b + 127) // 128) * 128)
            xre = np.zeros((n, bp), np.float32)
            xim = np.zeros((n, bp), np.float32)
            xre[:, :b] = x.real.T
            xim[:, :b] = x.imag.T
            yre, yim = stockham_fft_nb(jnp.asarray(xre), jnp.asarray(xim),
                                       inverse=(direction == "inverse"))
            out = (np.asarray(yre)[:, :b] + 1j * np.asarray(yim)[:, :b]).T
            return out[0] if squeeze else out
        return run
    return make


def _mk_stockham_bf16(direction: str):
    """bf16 interop-tier surface (round-2 Exp 26): planes cross HBM as
    bfloat16, butterflies run in f32 in-kernel, accuracy is
    I/O-rounding-limited (~4e-3). For bf16-resident ML pipelines — the
    fused conversion replaces the caller's convert passes; standalone speed
    is ~the f32 tier (jnp.fft has no bf16 complex transform at all)."""
    import jax.numpy as jnp
    from .ops.pallas_stockham import stockham_fft_nb

    def make(n: int):
        def run(x):
            x = np.asarray(x)
            squeeze = x.ndim == 1
            x = np.atleast_2d(x).astype(np.complex64)
            b = x.shape[0]
            bp = max(128, ((b + 127) // 128) * 128)
            xre = np.zeros((n, bp), np.float32)
            xim = np.zeros((n, bp), np.float32)
            xre[:, :b] = x.real.T
            xim[:, :b] = x.imag.T
            yre, yim = stockham_fft_nb(jnp.asarray(xre, jnp.bfloat16),
                                       jnp.asarray(xim, jnp.bfloat16),
                                       inverse=(direction == "inverse"))
            yre = np.asarray(yre.astype(jnp.float32))
            yim = np.asarray(yim.astype(jnp.float32))
            out = (yre[:, :b] + 1j * yim[:, :b]).T
            return out[0] if squeeze else out
        return run
    return make


def _mk_bluestein(direction: str):
    """Arbitrary-size chirp-z surface (ops/bluestein.py): any n via three
    pow2 transforms on the fast kernels — new scope beyond the pow2-only
    reference. Registered at pow2 sizes for the sweep meta-tests; the
    fftlib namespace dispatches non-pow2 sizes here."""
    import jax.numpy as jnp
    from .ops.bluestein import bluestein_fft_nb

    def make(n: int):
        def run(x):
            x = np.asarray(x)
            squeeze = x.ndim == 1
            x = np.atleast_2d(x).astype(np.complex64)
            b = x.shape[0]
            yre, yim = bluestein_fft_nb(
                jnp.asarray(np.ascontiguousarray(x.real.T), jnp.float32),
                jnp.asarray(np.ascontiguousarray(x.imag.T), jnp.float32),
                inverse=(direction == "inverse"))
            out = (np.asarray(yre)[:, :b] + 1j * np.asarray(yim)[:, :b]).T
            return out[0] if squeeze else out
        return run
    return make


def _mk_rfft_pallas(direction: str):
    """Fused Pallas real-FFT surface (f32, time-major); adapter as above."""
    import jax.numpy as jnp
    from .ops.pallas_rfft import rfft_nb, irfft_nb

    def make(n: int):
        m = n // 2

        def run(x):
            x = np.asarray(x)
            squeeze = x.ndim == 1
            x2 = np.atleast_2d(x)
            b = x2.shape[0]
            bp = max(128, ((b + 127) // 128) * 128)
            if direction == "forward":
                xt = np.zeros((n, bp), np.float32)
                xt[:, :b] = np.real(x2).T
                yre, yim = rfft_nb(jnp.asarray(xt))
                out = (np.asarray(yre)[:, :b] + 1j * np.asarray(yim)[:, :b]).T
            else:
                x2 = x2.astype(np.complex64)
                xre = np.zeros((m + 1, bp), np.float32)
                xim = np.zeros((m + 1, bp), np.float32)
                xre[:, :b] = x2.real.T
                xim[:, :b] = x2.imag.T
                out = np.asarray(irfft_nb(jnp.asarray(xre), jnp.asarray(xim)))[:, :b].T
            return out[0] if squeeze else out
        return run
    return make


def _mk_rfft_large(direction: str):
    """Large-N real surface: pack-as-complex on the batched four-step core
    (ops/large.rfft_large_nb); adapter as above."""
    import jax.numpy as jnp
    from .ops.large import rfft_large_nb, irfft_large_nb

    def make(n: int):
        m = n // 2

        def run(x):
            x = np.asarray(x)
            squeeze = x.ndim == 1
            x2 = np.atleast_2d(x)
            b = x2.shape[0]
            bp = max(128, ((b + 127) // 128) * 128)
            if direction == "forward":
                xt = np.zeros((n, bp), np.float32)
                xt[:, :b] = np.real(x2).T
                yre, yim = rfft_large_nb(jnp.asarray(xt))
                out = (np.asarray(yre)[:, :b] + 1j * np.asarray(yim)[:, :b]).T
            else:
                x2 = x2.astype(np.complex64)
                xre = np.zeros((m + 1, bp), np.float32)
                xim = np.zeros((m + 1, bp), np.float32)
                xre[:, :b] = x2.real.T
                xim[:, :b] = x2.imag.T
                out = np.asarray(irfft_large_nb(jnp.asarray(xre),
                                                jnp.asarray(xim)))[:, :b].T
            return out[0] if squeeze else out
        return run
    return make


def _mk_doublefloat(inverse: bool):
    """Double-f32 kernel surface: the TPU-native f64 tier (hi/lo split
    planes, ~6e-15 rel err on chip)."""
    import jax.numpy as jnp
    from .ops.doublefloat import df_fft_nb, split_f64, merge_f64

    def make(n: int):
        def run(x):
            x = np.asarray(x, np.complex128)
            squeeze = x.ndim == 1
            x2 = np.atleast_2d(x)
            b = x2.shape[0]
            bp = max(128, ((b + 127) // 128) * 128)
            re = np.zeros((n, bp), np.float64)
            im = np.zeros((n, bp), np.float64)
            re[:, :b] = x2.real.T
            im[:, :b] = x2.imag.T
            rh, rl = split_f64(re)
            ih, il = split_f64(im)
            orh, orl, oih, oil = df_fft_nb(jnp.asarray(rh), jnp.asarray(rl),
                                           jnp.asarray(ih), jnp.asarray(il),
                                           inverse=inverse)
            out = (merge_f64(np.asarray(orh), np.asarray(orl))
                   + 1j * merge_f64(np.asarray(oih), np.asarray(oil)))
            out = out[:, :b].T
            return out[0] if squeeze else out
        return run
    return make


def _mk_rfft_fused(direction: str):
    """Single-pass fused Pallas real surface (alternate, non-flagship)."""
    import jax.numpy as jnp
    from .ops.pallas_rfft import rfft_nb_fused, irfft_nb_fused

    def make(n: int):
        m = n // 2

        def run(x):
            x = np.asarray(x)
            squeeze = x.ndim == 1
            x2 = np.atleast_2d(x)
            b = x2.shape[0]
            bp = max(128, ((b + 127) // 128) * 128)
            if direction == "forward":
                xt = np.zeros((n, bp), np.float32)
                xt[:, :b] = np.real(x2).T
                yre, yim = rfft_nb_fused(jnp.asarray(xt))
                out = (np.asarray(yre)[:, :b] + 1j * np.asarray(yim)[:, :b]).T
            else:
                x2 = x2.astype(np.complex64)
                xre = np.zeros((m + 1, bp), np.float32)
                xim = np.zeros((m + 1, bp), np.float32)
                xre[:, :b] = x2.real.T
                xim[:, :b] = x2.imag.T
                out = np.asarray(irfft_nb_fused(jnp.asarray(xre),
                                                jnp.asarray(xim)))[:, :b].T
            return out[0] if squeeze else out
        return run
    return make


def _mk_doublefloat_rfft(direction: str):
    """Double-f32 real surface (f64-class TPU real transforms, both
    directions — the reference's f64 real module had no inverse)."""
    import jax.numpy as jnp
    from .ops.doublefloat import df_rfft_nb, df_irfft_nb, split_f64, merge_f64

    def make(n: int):
        m = n // 2

        def run(x):
            x = np.asarray(x)
            squeeze = x.ndim == 1
            x2 = np.atleast_2d(x)
            b = x2.shape[0]
            bp = max(128, ((b + 127) // 128) * 128)
            if direction == "forward":
                xt = np.zeros((n, bp), np.float64)
                xt[:, :b] = np.real(x2).T
                xh, xl = split_f64(xt)
                orh, orl, oih, oil = df_rfft_nb(jnp.asarray(xh), jnp.asarray(xl))
                out = (merge_f64(np.asarray(orh), np.asarray(orl))
                       + 1j * merge_f64(np.asarray(oih), np.asarray(oil)))
                out = out[:, :b].T
            else:
                x2 = np.asarray(x2, np.complex128)
                re = np.zeros((m + 1, bp), np.float64)
                im = np.zeros((m + 1, bp), np.float64)
                re[:, :b] = x2.real.T
                im[:, :b] = x2.imag.T
                rh, rl = split_f64(re)
                ih, il = split_f64(im)
                oh, ol = df_irfft_nb(jnp.asarray(rh), jnp.asarray(rl),
                                     jnp.asarray(ih), jnp.asarray(il))
                out = merge_f64(np.asarray(oh), np.asarray(ol))[:, :b].T
            return out[0] if squeeze else out
        return run
    return make


def _mk_mxu_dft(inverse: bool):
    """MXU DFT-matmul surface (f32, time-major, n<=128); adapter as above."""
    import jax.numpy as jnp
    from .ops.mxu_dft import dft_matmul_nb

    def make(n: int):
        def run(x):
            x = np.asarray(x)
            squeeze = x.ndim == 1
            x = np.atleast_2d(x).astype(np.complex64)
            b = x.shape[0]
            bp = max(128, ((b + 127) // 128) * 128)
            xre = np.zeros((n, bp), np.float32)
            xim = np.zeros((n, bp), np.float32)
            xre[:, :b] = x.real.T
            xim[:, :b] = x.imag.T
            yre, yim = dft_matmul_nb(jnp.asarray(xre), jnp.asarray(xim),
                                     inverse=inverse)
            out = (np.asarray(yre)[:, :b] + 1j * np.asarray(yim)[:, :b]).T
            return out[0] if squeeze else out
        return run
    return make


def _mk_large_nb(inverse: bool):
    """Batched four-step surface (f32, n >= 2^14): both factor FFTs on the
    Pallas kernel, four-step twiddle fused into kernel 1's store (round-2
    Exp 22). The planner dispatches the public API here for n > 16384."""
    import jax.numpy as jnp
    from .ops.large import fft_large_nb

    def make(n: int):
        def run(x):
            x = np.asarray(x)
            squeeze = x.ndim == 1
            x = np.atleast_2d(x).astype(np.complex64)
            b = x.shape[0]
            bp = 1 << max(0, b - 1).bit_length()  # power-of-two batch
            xre = np.zeros((n, bp), np.float32)
            xim = np.zeros((n, bp), np.float32)
            xre[:, :b] = x.real.T
            xim[:, :b] = x.imag.T
            yre, yim = fft_large_nb(jnp.asarray(xre), jnp.asarray(xim),
                                    inverse=inverse)
            out = (np.asarray(yre)[:, :b] + 1j * np.asarray(yim)[:, :b]).T
            return out[0] if squeeze else out
        return run
    return make


def _build_registry() -> list[SurfaceEntry]:
    out: list[SurfaceEntry] = []
    for surface, direction in (("complex-forward", "forward"),
                               ("complex-inverse", "inverse")):
        out.append(SurfaceEntry(
            name="stockham-pallas", surface=surface, dtype="float32",
            min_size=2, max_size=16384, flagship=False, baseline=False,
            make=_mk_stockham(direction)))
    for surface, direction in (("complex-forward", "forward"),
                               ("complex-inverse", "inverse")):
        out.append(SurfaceEntry(
            name="stockham-bf16", surface=surface, dtype="bfloat16",
            min_size=2, max_size=16384, flagship=False, baseline=False,
            make=_mk_stockham_bf16(direction)))
    for surface, direction in (("real-forward", "forward"),
                               ("real-inverse", "inverse")):
        out.append(SurfaceEntry(
            name="rfft-pallas", surface=surface, dtype="float32",
            min_size=8, max_size=16384, flagship=False, baseline=False,
            make=_mk_rfft_pallas(direction)))
    for surface, inverse in (("complex-forward", False),
                             ("complex-inverse", True)):
        # full benched range: CPU sweeps stay tractable because the df plan
        # drops to radix-4 off-TPU (config.df_max_radix, Exp 18); 4096 caps
        # the 4-plane VMEM live set at tile 128 (~71 MB < the 100 MB limit)
        out.append(SurfaceEntry(
            name="doublefloat-pallas", surface=surface, dtype="float64",
            min_size=2, max_size=4096, flagship=False, baseline=False,
            make=_mk_doublefloat(inverse)))
    for surface, direction in (("real-forward", "forward"),
                               ("real-inverse", "inverse")):
        out.append(SurfaceEntry(
            name="doublefloat-rfft", surface=surface, dtype="float64",
            min_size=8, max_size=8192, flagship=False, baseline=False,
            make=_mk_doublefloat_rfft(direction)))
    for surface, direction in (("real-forward", "forward"),
                               ("real-inverse", "inverse")):
        # single-pass fused surface (blocked MXU mirror, Exp 32): the fused
        # FORWARD wins on chip at the planner's codelet-table sizes
        # (config.RFFT_FUSED_FWD_SIZES — fused/hybrid 0.53..0.69 at
        # 16/32/64/4096 standalone, Exp 35) and is dispatched there;
        # max_size bounds CPU-interpret sweep time
        out.append(SurfaceEntry(
            name="rfft-pallas-fused", surface=surface, dtype="float32",
            min_size=16, max_size=4096, flagship=False, baseline=False,
            make=_mk_rfft_fused(direction)))
    for surface, direction in (("complex-forward", "forward"),
                               ("complex-inverse", "inverse")):
        # arbitrary-size chirp-z surface (pow2 sizes here for the sweep
        # meta-tests; fftlib routes non-pow2 sizes through it)
        out.append(SurfaceEntry(
            name="bluestein", surface=surface, dtype="float32",
            min_size=16, max_size=4096, flagship=False, baseline=False,
            make=_mk_bluestein(direction)))
    for surface, direction in (("real-forward", "forward"),
                               ("real-inverse", "inverse")):
        # large-N real path: m = n/2 core on the batched four-step — the
        # planner's real dispatch target past the Stockham ceiling
        out.append(SurfaceEntry(
            name="rfft-large", surface=surface, dtype="float32",
            min_size=1 << 15, max_size=1 << 21, flagship=False, baseline=False,
            make=_mk_rfft_large(direction)))
    for surface, inverse in (("complex-forward", False),
                             ("complex-inverse", True)):
        # MXU DFT-matmul small-N path (Exp 17): loses to the VPU Stockham
        # kernel on chip, kept registered so the alternative cannot rot
        out.append(SurfaceEntry(
            name="mxu-dft", surface=surface, dtype="float32",
            min_size=2, max_size=128, flagship=False, baseline=False,
            make=_mk_mxu_dft(inverse)))
    for surface, inverse in (("complex-forward", False),
                             ("complex-inverse", True)):
        # batched four-step on the Pallas kernel — the planner's dispatch
        # target for n > 16384 (round-2 Exp 22: x1.18 at 32768, x2.59 at
        # 2^17 vs jnp; the XLA einsum path lost at 0.75x)
        # max 2^22: past 2^20 only the 2D tiled-twiddle branch survives
        # (single/small-batch; the registry adapter runs batch=1), winning
        # 1.27x/1.78x at 2^21/2^22 where the XLA fourstep ties jnp
        out.append(SurfaceEntry(
            name="large-nb", surface=surface, dtype="float32",
            min_size=1 << 14, max_size=1 << 22, flagship=False, baseline=False,
            make=_mk_large_nb(inverse)))
    for dtype in ("float32", "float64"):
        max_n = 1 << 20
        for surface, kind, direction in (
            ("complex-forward", "c2c", "forward"),
            ("complex-inverse", "c2c", "inverse"),
            ("real-forward", "r2c", "forward"),
            ("real-inverse", "r2c", "inverse"),
        ):
            min_n = 2 if kind == "c2c" else 4
            # flagship = the planner-dispatched public entry points (what
            # watfft_tpu.fft/rfft run); the explicit four-step XLA path
            # stays registered under its own name
            out.append(SurfaceEntry(
                name="dispatch", surface=surface, dtype=dtype,
                min_size=min_n, max_size=max_n, flagship=True, baseline=False,
                make=_mk(kind, direction, dtype, dispatched=True)))
            out.append(SurfaceEntry(
                name="fourstep-mxu", surface=surface, dtype=dtype,
                min_size=min_n, max_size=max_n, flagship=False, baseline=False,
                make=_mk(kind, direction, dtype)))
            out.append(SurfaceEntry(
                name="jnp-fft", surface=surface, dtype=dtype,
                min_size=min_n, max_size=max_n, flagship=False, baseline=True,
                make=_mk_jnp_fft(surface, dtype)))
    return out


REGISTRY: list[SurfaceEntry] = _build_registry()


def entries(surface: Optional[str] = None, dtype: Optional[str] = None,
            include_baselines: bool = False) -> list[SurfaceEntry]:
    out = [e for e in REGISTRY
           if (surface is None or e.surface == surface)
           and (dtype is None or e.dtype == dtype)
           and (include_baselines or not e.baseline)]
    return out


def flagship(surface: str, dtype: str) -> SurfaceEntry:
    f = [e for e in entries(surface, dtype) if e.flagship]
    if len(f) != 1:
        raise RuntimeError(f"expected exactly one flagship for {surface}/{dtype}, got {len(f)}")
    return f[0]
