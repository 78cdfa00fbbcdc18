"""jnp.fft-compatible namespace backed by watfft_tpu kernels.

Drop-in switching for code written against jax.numpy.fft:

    from watfft_tpu import fftlib as fft
    X = fft.fft(x, axis=-1, norm=None)

Supported: fft/ifft/rfft/irfft/fft2/ifft2 with `axis`/`axes` and `norm`
(None|'backward', 'ortho', 'forward'), plus fftfreq/rfftfreq/fftshift/
ifftshift utilities. Power-of-two sizes only (ValueError otherwise),
matching the framework's kernel coverage; `n=` padding/truncation is
supported like numpy's.

On TPU backends the complex-dtype plumbing (pad/moveaxis/scale) runs in
HOST numpy: complex dtypes cannot cross the axon tunnel's device boundary
and eager complex ops fail there (api._BaseContext documents this). The
transforms themselves still run on the chip through the plane APIs; for
fully device-resident pipelines use the split-plane context entry points.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import api

__all__ = ["fft", "ifft", "rfft", "irfft", "fft2", "ifft2",
           "fftfreq", "rfftfreq", "fftshift", "ifftshift"]


def _xp():
    """Array namespace for complex plumbing: numpy on TPU backends (complex
    never touches the axon device), jnp elsewhere (stays on device)."""
    return np if jax.default_backend() == "tpu" else jnp


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


def fft(a, n=None, axis=-1, norm=None):
    xp = _xp()
    a = xp.asarray(a)
    a, n = _fix_len(xp, a, n, axis)
    moved = xp.moveaxis(a, axis, -1)
    out = api.fft(moved)
    s = _norm_scale(norm, n, "fwd")
    if s != 1.0:
        out = out * s
    return xp.moveaxis(out, -1, axis)


def ifft(a, n=None, axis=-1, norm=None):
    xp = _xp()
    a = xp.asarray(a)
    a, n = _fix_len(xp, a, n, axis)
    moved = xp.moveaxis(a, axis, -1)
    out = api.ifft(moved)
    s = _norm_scale(norm, n, "inv")
    if s != 1.0:
        out = out * s
    return xp.moveaxis(out, -1, axis)


def rfft(a, n=None, axis=-1, norm=None):
    xp = _xp()
    a = xp.asarray(a)
    a, n = _fix_len(xp, a, n, axis)
    moved = xp.moveaxis(a, axis, -1)
    out = api.rfft(moved)
    s = _norm_scale(norm, n, "fwd")
    if s != 1.0:
        out = out * s
    return xp.moveaxis(out, -1, axis)


def irfft(a, n=None, axis=-1, norm=None):
    xp = _xp()
    a = xp.asarray(a)
    if n is not None:
        m = n // 2 + 1
        a, _ = _fix_len(xp, a, m, axis)
    moved = xp.moveaxis(a, axis, -1)
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
    out = api.ifft2(a)
    n = out.shape[-1] * out.shape[-2]
    s = _norm_scale(norm, n, "inv")
    if s != 1.0:
        out = out * s
    if tuple(axes) != (-2, -1):
        out = xp.moveaxis(out, (-2, -1), axes)
    return out


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
