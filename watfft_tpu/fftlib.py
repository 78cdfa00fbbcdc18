"""jnp.fft-compatible namespace backed by watfft_tpu kernels.

Drop-in switching for code written against jax.numpy.fft:

    from watfft_tpu import fftlib as fft
    X = fft.fft(x, axis=-1, norm=None)

Supported: fft/ifft/rfft/irfft/fft2/ifft2 with `axis`/`axes` and `norm`
(None|'backward', 'ortho', 'forward'), plus fftfreq/rfftfreq/fftshift/
ifftshift utilities. Power-of-two sizes run the native kernels; ANY other
size (including odd irfft lengths, with numpy's no-Nyquist semantics)
routes through the Bluestein chirp-z transform (ops/bluestein.py), which
itself rides the pow2 kernels — new scope beyond the pow2-only reference.
`n=` padding/truncation is supported like numpy's.

On TPU backends the complex-dtype plumbing (pad/moveaxis/scale) runs in
HOST numpy: complex dtypes cannot cross the axon tunnel's device boundary
and eager complex ops fail there (api._BaseContext documents this). The
transforms themselves still run on the chip through the plane APIs; for
fully device-resident pipelines use the split-plane context entry points.
Measured cost of this convenience (BENCH r3, n=1024 b=2048): one
`fftlib.fft` call pays ~11-20x the per-call time of a chained split-plane
dispatch (run-dependent; 11x and 20x across two chip sessions) — the host
round-trips, not the transform, dominate. The split-plane `*_planes_nb`
entry points are the production path on TPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import api

__all__ = ["fft", "ifft", "rfft", "irfft", "fft2", "ifft2",
           "fftn", "ifftn", "rfft2", "irfft2", "hfft", "ihfft",
           "fftfreq", "rfftfreq", "fftshift", "ifftshift"]


def _xp():
    """Array namespace for complex plumbing: numpy on the axon tunnel
    (complex never touches that device — api._complex_device_ok), jnp
    everywhere else (CPU backends AND directly-attached TPUs: the plumbing
    stays device-resident and the convenience calls compile to one program
    through the context jits)."""
    return jnp if api._complex_device_ok() else np


def _norm_scale(norm, n, direction):
    """Scale to apply on top of our convention (unnormalized fwd, 1/n inv)."""
    if norm in (None, "backward"):
        return 1.0
    if norm == "ortho":
        return (1.0 / np.sqrt(n)) if direction == "fwd" else np.sqrt(n)
    if norm == "forward":
        return (1.0 / n) if direction == "fwd" else float(n)
    raise ValueError(f"invalid norm {norm!r}")


def _fix_len(xp, x, n, axis):
    if n is None:
        return x, x.shape[axis]
    cur = x.shape[axis]
    if n == cur:
        return x, n
    pad = [(0, 0)] * x.ndim
    if n > cur:
        pad[axis] = (0, n - cur)
        return xp.pad(x, pad), n
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, n)
    return x[tuple(idx)], n


def _is_pow2(n: int) -> bool:
    return n >= 1 and (n & (n - 1)) == 0


def _bluestein_bm(moved, inverse: bool, xp):
    """Batch-major complex transform of arbitrary length via the Bluestein
    chirp-z path (host plane plumbing, device pow2 kernels — same pattern
    as the pow2 convenience path on TPU backends)."""
    from .ops.bluestein import bluestein_fft_nb
    lead = moved.shape[:-1]
    n = moved.shape[-1]
    if xp is jnp:  # complex-capable device: stay resident end-to-end
        z = jnp.asarray(moved, jnp.complex64).reshape(-1, n).T
        ore, oim = bluestein_fft_nb(z.real, z.imag, inverse=inverse)
        return (ore + 1j * oim).T.reshape(*lead, n)
    a2 = np.asarray(moved).astype(np.complex64).reshape(-1, n)
    re = jnp.asarray(np.ascontiguousarray(a2.real.T))
    im = jnp.asarray(np.ascontiguousarray(a2.imag.T))
    ore, oim = bluestein_fft_nb(re, im, inverse=inverse)
    out = (np.asarray(ore) + 1j * np.asarray(oim)).T.reshape(*lead, n)
    return xp.asarray(out)


def _fft_any(moved, inverse: bool, xp):
    if _is_pow2(moved.shape[-1]):
        return api.ifft(moved) if inverse else api.fft(moved)
    from . import planner
    if planner.native_backend_fft():
        # non-TPU backends: the native XLA FFT handles any n directly and
        # beats the three-pow2-transform Bluestein route (the same
        # FFTW-planner decision as the pow2 'xla-fft' dispatch)
        z = jnp.asarray(moved)
        return jnp.fft.ifft(z) if inverse else jnp.fft.fft(z)
    return _bluestein_bm(moved, inverse, xp)


def fft(a, n=None, axis=-1, norm=None):
    xp = _xp()
    a = xp.asarray(a)
    a, n = _fix_len(xp, a, n, axis)
    moved = xp.moveaxis(a, axis, -1)
    out = _fft_any(moved, False, xp)
    s = _norm_scale(norm, n, "fwd")
    if s != 1.0:
        out = out * s
    return xp.moveaxis(out, -1, axis)


def ifft(a, n=None, axis=-1, norm=None):
    xp = _xp()
    a = xp.asarray(a)
    a, n = _fix_len(xp, a, n, axis)
    moved = xp.moveaxis(a, axis, -1)
    out = _fft_any(moved, True, xp)
    s = _norm_scale(norm, n, "inv")
    if s != 1.0:
        out = out * s
    return xp.moveaxis(out, -1, axis)


def rfft(a, n=None, axis=-1, norm=None):
    xp = _xp()
    a = xp.asarray(a)
    a, n = _fix_len(xp, a, n, axis)
    moved = xp.moveaxis(a, axis, -1)
    from . import planner
    if _is_pow2(n):
        out = api.rfft(moved)
    elif planner.native_backend_fft():
        out = jnp.fft.rfft(jnp.asarray(moved))  # non-TPU: native any-n rfft
    else:
        # arbitrary length: complex Bluestein on the real signal, keep the
        # non-negative half-spectrum (numpy's rfft bins)
        out = _bluestein_bm(moved.astype(np.complex64) if xp is np
                            else moved.astype(jnp.complex64), False, xp)
        out = out[..., :n // 2 + 1]
    s = _norm_scale(norm, n, "fwd")
    if s != 1.0:
        out = out * s
    return xp.moveaxis(out, -1, axis)


def _irfft_bluestein(moved, n, xp):
    """Arbitrary-length irfft: reconstruct the full Hermitian spectrum and
    run the Bluestein inverse; numpy semantics exactly — the imaginary part
    of bin 0 is ignored, and for EVEN n so is the Nyquist bin's, while for
    ODD n the last bin's imaginary part is USED (there is no Nyquist bin)."""
    if xp is jnp:  # complex-capable device: stay resident
        spec = jnp.asarray(moved, jnp.complex64)
        spec = spec.at[..., 0].set(spec[..., 0].real.astype(jnp.complex64))
        if n % 2 == 0:
            spec = spec.at[..., -1].set(
                spec[..., -1].real.astype(jnp.complex64))
            mid = spec[..., 1:-1]
        else:
            mid = spec[..., 1:]
        full = jnp.concatenate([spec, jnp.conj(mid[..., ::-1])], axis=-1)
        return _bluestein_bm(full, True, jnp).real
    spec = np.asarray(moved).astype(np.complex64)
    spec[..., 0] = spec[..., 0].real
    if n % 2 == 0:
        spec[..., -1] = spec[..., -1].real
        mid = spec[..., 1:-1]
    else:
        mid = spec[..., 1:]
    full = np.concatenate([spec, np.conj(mid[..., ::-1])], axis=-1)
    out = _bluestein_bm(full, True, np)
    return xp.asarray(out.real)


def irfft(a, n=None, axis=-1, norm=None):
    xp = _xp()
    a = xp.asarray(a)
    if n is None:
        n = 2 * (a.shape[axis] - 1)
    m = n // 2 + 1
    a, _ = _fix_len(xp, a, m, axis)
    if not (_is_pow2(n) and n >= 2):
        from . import planner
        moved = xp.moveaxis(a, axis, -1)
        if planner.native_backend_fft():  # non-TPU: native any-n irfft
            out = jnp.fft.irfft(jnp.asarray(moved), n=n)
        else:
            out = _irfft_bluestein(moved, n, xp)
        s = _norm_scale(norm, n, "inv")
        if s != 1.0:
            out = out * s
        return xp.moveaxis(out, -1, axis)
    moved = xp.moveaxis(a, axis, -1)
    # numpy semantics: the imaginary parts of the DC and Nyquist bins are
    # ignored (a Hermitian spectrum has real ends); our kernel's composed
    # map READS those rows (they carry information in the packed layout —
    # Exp 21), so zero them here for drop-in parity
    ends = moved[..., :1].real, moved[..., -1:].real
    if xp is np:
        moved = moved.copy()
        moved[..., 0] = ends[0][..., 0]
        moved[..., -1] = ends[1][..., 0]
    else:
        moved = moved.at[..., 0].set(ends[0][..., 0])
        moved = moved.at[..., -1].set(ends[1][..., 0])
    out = api.irfft(moved)
    nn = out.shape[-1]
    s = _norm_scale(norm, nn, "inv")
    if s != 1.0:
        out = out * s
    return xp.moveaxis(out, -1, axis)


def fft2(a, axes=(-2, -1), norm=None):
    xp = _xp()
    a = xp.asarray(a)
    if tuple(axes) != (-2, -1):
        a = xp.moveaxis(a, axes, (-2, -1))
    if a.ndim < 2 or not (_is_pow2(a.shape[-2]) and _is_pow2(a.shape[-1])):
        # numpy parity for any size: axis-by-axis through the 1D dispatch
        # (non-pow2 axes take the Bluestein / native-FFT route)
        out = fft(fft(a, axis=-1, norm=None), axis=-2, norm=None)
    else:
        out = api.fft2(a)
    n = out.shape[-1] * out.shape[-2]
    s = _norm_scale(norm, n, "fwd")
    if s != 1.0:
        out = out * s
    if tuple(axes) != (-2, -1):
        out = xp.moveaxis(out, (-2, -1), axes)
    return out


def ifft2(a, axes=(-2, -1), norm=None):
    xp = _xp()
    a = xp.asarray(a)
    if tuple(axes) != (-2, -1):
        a = xp.moveaxis(a, axes, (-2, -1))
    if a.ndim < 2 or not (_is_pow2(a.shape[-2]) and _is_pow2(a.shape[-1])):
        out = ifft(ifft(a, axis=-1, norm=None), axis=-2, norm=None)
    else:
        out = api.ifft2(a)
    n = out.shape[-1] * out.shape[-2]
    s = _norm_scale(norm, n, "inv")
    if s != 1.0:
        out = out * s
    if tuple(axes) != (-2, -1):
        out = xp.moveaxis(out, (-2, -1), axes)
    return out


def _resolve_axes(a, s, axes):
    if axes is None:
        axes = (tuple(range(a.ndim)) if s is None
                else tuple(range(-len(s), 0)))
    axes = tuple(int(ax) for ax in axes)
    if s is None:
        s = tuple(a.shape[ax] for ax in axes)
    if len(s) != len(axes):
        raise ValueError(f"s and axes length mismatch: {s} vs {axes}")
    return s, axes


def fftn(a, s=None, axes=None, norm=None):
    """N-D FFT over `axes` (default: all), applied axis-by-axis through the
    1D dispatch path (the trailing pair could use fft2; axis-sequential
    keeps `s`/`axes` semantics exactly numpy's)."""
    xp = _xp()
    a = xp.asarray(a)
    s, axes = _resolve_axes(a, s, axes)
    ntot = 1
    for ax, n in zip(axes, s):
        a = fft(a, n=n, axis=ax, norm=None)
        ntot *= n
    sc = _norm_scale(norm, ntot, "fwd")
    return a * sc if sc != 1.0 else a


def ifftn(a, s=None, axes=None, norm=None):
    xp = _xp()
    a = xp.asarray(a)
    s, axes = _resolve_axes(a, s, axes)
    ntot = 1
    for ax, n in zip(axes, s):
        a = ifft(a, n=n, axis=ax, norm=None)
        ntot *= n
    sc = _norm_scale(norm, ntot, "inv")
    return a * sc if sc != 1.0 else a


def _is_trailing_pair(axes, ndim):
    ax = tuple(a % ndim for a in axes)
    return ndim >= 2 and ax == (ndim - 2, ndim - 1)


def rfft2(a, s=None, axes=(-2, -1), norm=None):
    """2D real FFT. Trailing power-of-two axes with matching `s` and real
    input take the fused half-width path (api.rfft2: one fft2 kernel + one
    2D Hermitian recombination); anything else composes rfft rows + fft
    columns through the 1D dispatch."""
    xp = _xp()
    a = xp.asarray(a)
    if s is None:
        s = (a.shape[axes[0]], a.shape[axes[1]])
    if (_is_trailing_pair(axes, a.ndim)
            and tuple(s) == (a.shape[-2], a.shape[-1])
            and _is_pow2(s[0]) and _is_pow2(s[1]) and s[1] >= 4
            and not xp.iscomplexobj(a)):
        from . import api
        out = api.rfft2(a)
        sc = _norm_scale(norm, s[0] * s[1], "fwd")
        return out * sc if sc != 1.0 else out
    out = rfft(a, n=s[1], axis=axes[1], norm=None)
    out = fft(out, n=s[0], axis=axes[0], norm=None)
    sc = _norm_scale(norm, s[0] * s[1], "fwd")
    return out * sc if sc != 1.0 else out


def irfft2(a, s=None, axes=(-2, -1), norm=None):
    xp = _xp()
    a = xp.asarray(a)
    if s is None:
        s = (a.shape[axes[0]], 2 * (a.shape[axes[1]] - 1))
    if (_is_trailing_pair(axes, a.ndim)
            and tuple(s) == (a.shape[-2], 2 * (a.shape[-1] - 1))
            and _is_pow2(s[0]) and _is_pow2(s[1]) and s[1] >= 4):
        from . import api
        out = api.irfft2(a)
        sc = _norm_scale(norm, s[0] * s[1], "inv")
        return out * sc if sc != 1.0 else out
    out = ifft(a, n=s[0], axis=axes[0], norm=None)
    out = irfft(out, n=s[1], axis=axes[1], norm=None)
    sc = _norm_scale(norm, s[0] * s[1], "inv")
    return out * sc if sc != 1.0 else out


def hfft(a, n=None, axis=-1, norm=None):
    """FFT of Hermitian-symmetric input -> real output, via the real-path
    kernels: hfft(x, n) = n * irfft(conj(x), n) (numpy's identity)."""
    xp = _xp()
    a = xp.asarray(a)
    out = irfft(xp.conj(a), n=n, axis=axis, norm=None)
    nn = out.shape[axis]
    sc = float(nn) * _norm_scale(norm, nn, "fwd")
    return out * sc if sc != 1.0 else out


def ihfft(a, n=None, axis=-1, norm=None):
    """Inverse of hfft: ihfft(x, n) = conj(rfft(x, n)) / n."""
    xp = _xp()
    a = xp.asarray(a)
    out = rfft(a, n=n, axis=axis, norm=None)
    nn = a.shape[axis] if n is None else n
    sc = (1.0 / nn) * _norm_scale(norm, nn, "inv")
    return xp.conj(out) * sc


def fftfreq(n, d=1.0):
    return jnp.fft.fftfreq(n, d)


def rfftfreq(n, d=1.0):
    return jnp.fft.rfftfreq(n, d)


def fftshift(x, axes=None):
    if isinstance(x, np.ndarray):
        return np.fft.fftshift(x, axes)
    return jnp.fft.fftshift(x, axes)


def ifftshift(x, axes=None):
    if isinstance(x, np.ndarray):
        return np.fft.ifftshift(x, axes)
    return jnp.fft.ifftshift(x, axes)
