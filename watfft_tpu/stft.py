"""STFT / spectrogram pipeline — the library-side port of the reference's
playground DSP (playground/src/spectrogram.js: window functions at :15-30,
zero-padding, log/mel frequency scales; SURVEY.md §2.2), turned into
batched TPU-friendly ops. This is also the workload behind BASELINE.json
config 4 (4096 independent N=1024 transforms packed along the lane axis).

All functions are jit-friendly and operate on real signals [..., t].
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .plan import is_power_of_two

__all__ = ["get_window", "frame", "stft", "istft", "spectrogram",
           "mel_filterbank", "fftconvolve"]


def _check_stft_args(n_fft: int, hop: int, t: int | None = None) -> None:
    """Typed boundary checks (reference analog: tests/boundary.test.js —
    rejection is explicit and typed, never a raw kernel error)."""
    if not isinstance(n_fft, (int, np.integer)) or not is_power_of_two(int(n_fft)) or n_fft < 4:
        raise ValueError(f"n_fft must be a power of two >= 4, got {n_fft!r}")
    if not isinstance(hop, (int, np.integer)) or hop < 1:
        raise ValueError(f"hop must be a positive integer, got {hop!r}")
    if t is not None and t < n_fft:
        raise ValueError(
            f"signal length {t} is shorter than n_fft={n_fft}: no full frame")


def get_window(name: str, n: int, dtype=np.float32) -> np.ndarray:
    """Analysis windows (reference: playground/src/spectrogram.js:15-30).
    Periodic (DFT-even) variants, f64 host math."""
    t = np.arange(n) / n
    if name in ("rect", "rectangular", "boxcar"):
        w = np.ones(n)
    elif name == "hann":
        w = 0.5 - 0.5 * np.cos(2 * np.pi * t)
    elif name == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * t)
    elif name == "blackman":
        w = (0.42 - 0.5 * np.cos(2 * np.pi * t)
             + 0.08 * np.cos(4 * np.pi * t))
    elif name == "blackman-harris":
        w = (0.35875 - 0.48829 * np.cos(2 * np.pi * t)
             + 0.14128 * np.cos(4 * np.pi * t)
             - 0.01168 * np.cos(6 * np.pi * t))
    else:
        raise ValueError(f"unknown window {name!r}")
    return w.astype(dtype)


def frame(x, frame_length: int, hop: int):
    """[..., t] -> [..., num_frames, frame_length] sliding frames.

    Expressed as a gather-free reshape pipeline: pad to full coverage, then
    strided window extraction via dynamic_slice-free indexing (XLA lowers
    the take to an efficient gather; frames are static-shaped).
    """
    t = x.shape[-1]
    num = max(0, (t - frame_length) // hop + 1)
    idx = np.arange(num)[:, None] * hop + np.arange(frame_length)[None, :]
    return jnp.take(x, jnp.asarray(idx), axis=-1)


def stft(x, n_fft: int = 1024, hop: int = 256, window: str = "hann"):
    """Batched STFT: real [..., t] -> (re, im) planes [..., frames, n_fft//2+1].

    On TPU the frame batch rides the 128-lane axis through the Pallas real
    path (BASELINE config 4's workload: thousands of N-point transforms
    packed along lanes); elsewhere it uses the portable four-step surface.
    """
    _check_stft_args(n_fft, hop, jnp.shape(x)[-1])
    if jax.default_backend() == "tpu":
        return _stft_tpu(x, n_fft, hop, window)
    w = jnp.asarray(get_window(window, n_fft))
    frames = frame(x, n_fft, hop) * w
    ctx = _ctx_cache_get(n_fft)
    return ctx.forward_planes(frames)


def _frames_time_major(x, n_fft: int, hop: int, num: int):
    """frames[..., k, j] = x[..., j*hop + k], built from STRIDED SLICES
    instead of a gather (jnp.take lowers to a TPU gather, which serializes;
    round-2 Exp 23). With g = gcd(hop, n_fft), view the signal as [t/g, g]
    rows; frame row k = a*g + r is the stride-(hop/g) row slice starting at
    a, transposed — n_fft/g slices + one concat, all relayout-only ops."""
    import math as _m
    g = _m.gcd(hop, n_fft)
    hq = hop // g
    batch = x.shape[:-1]
    usable = (num - 1) * hop + n_fft
    xv = x[..., :usable].reshape(*batch, usable // g, g)
    slabs = []
    for a in range(n_fft // g):
        sl = jax.lax.slice_in_dim(xv, a, a + (num - 1) * hq + 1, hq, axis=-2)
        slabs.append(jnp.swapaxes(sl, -1, -2))  # [..., g, num]
    return jnp.concatenate(slabs, axis=-2)  # [..., n_fft, num]


def _stft_tpu(x, n_fft: int, hop: int, window: str):
    from . import config
    from .ops.pallas_rfft import rfft_nb
    x = jnp.asarray(x, jnp.float32)
    t = x.shape[-1]
    num = max(0, (t - n_fft) // hop + 1)
    batch = x.shape[:-1]
    lead = int(np.prod(batch)) if batch else 1
    frames = _frames_time_major(x, n_fft, hop, num)
    w = jnp.asarray(get_window(window, n_fft))[:, None]
    frames = frames * w
    # fold leading batch dims into lanes and pad to 128
    fr = jnp.moveaxis(frames.reshape(lead, n_fft, num), 0, -1).reshape(n_fft, num * lead)
    total = num * lead
    pad = (-total) % 128
    if pad:
        fr = jnp.pad(fr, ((0, 0), (0, pad)))
    padded = total + pad
    if n_fft <= 2 * config.DMA3D_MAX_N and padded % 1024 == 0:
        # native sublane-folded 3D layout (Exp 37): the kernel's core runs
        # 2.5-4x faster; the output merge back to 2D is one relayout the
        # downstream moveaxis pipeline absorbs
        re, im = rfft_nb(fr.reshape(n_fft, 8, padded // 8))
        re = re.reshape(-1, padded)
        im = im.reshape(-1, padded)
    else:
        re, im = rfft_nb(fr)
    bins = n_fft // 2 + 1
    re = jnp.moveaxis(re[:, :total].reshape(bins, num, lead), -1, 0)
    im = jnp.moveaxis(im[:, :total].reshape(bins, num, lead), -1, 0)
    re = jnp.swapaxes(re, -1, -2).reshape(*batch, num, bins)
    im = jnp.swapaxes(im, -1, -2).reshape(*batch, num, bins)
    return re, im


def istft(sre, sim, n_fft: int = 1024, hop: int = 256, window: str = "hann",
          length: int | None = None):
    """Inverse STFT with windowed overlap-add (COLA normalization).

    Overlap-add is ONE scatter-add over a precomputed index matrix (XLA
    lowers it to an efficient segment reduction), not a per-frame loop.
    NOTE: plan contexts are created eagerly (outside any jit) — creating
    them under a trace would cache tracer-backed tables."""
    _check_stft_args(n_fft, hop)
    ctx = _ctx_cache_get(n_fft)
    frames = ctx.inverse_planes(sre, sim)  # [..., num, n_fft]
    w = jnp.asarray(get_window(window, n_fft))
    frames = frames * w
    num = frames.shape[-2]
    t = (num - 1) * hop + n_fft
    batch = frames.shape[:-2]
    idx = (np.arange(num)[:, None] * hop
           + np.arange(n_fft)[None, :]).reshape(-1)
    flat = frames.reshape(*batch, num * n_fft)
    out = jnp.zeros((*batch, t), frames.dtype).at[..., idx].add(flat)
    norm = jnp.zeros((t,), frames.dtype).at[idx].add(
        jnp.tile(w * w, num))
    out = out / jnp.maximum(norm, 1e-8)
    if length is not None:
        out = out[..., :length]
    return out


def spectrogram(x, n_fft: int = 1024, hop: int = 256, window: str = "hann",
                log: bool = True, eps: float = 1e-10):
    """Power spectrogram [..., frames, bins]; log-magnitude by default."""
    re, im = stft(x, n_fft=n_fft, hop=hop, window=window)
    p = re * re + im * im
    return jnp.log(p + eps) if log else p


def mel_filterbank(n_mels: int, n_fft: int, sample_rate: float,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """[n_mels, n_fft//2+1] triangular mel filters (playground mel scale
    analog), host-built in f64."""
    fmax = fmax or sample_rate / 2
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / sample_rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        a, b, c = bins[i], bins[i + 1], bins[i + 2]
        if b > a:
            fb[i, a:b] = (np.arange(a, b) - a) / (b - a)
        if c > b:
            fb[i, b:c] = (c - np.arange(b, c)) / (c - b)
    return fb.astype(np.float32)


def fftconvolve(x, h, mode: str = "full"):
    """FFT-based linear convolution of real signals along the last axis.

    Both inputs are zero-padded to the next power of two >= t + k - 1 so the
    product rides the Pallas real path (one rfft each, a spectrum multiply,
    one irfft). Leading axes broadcast like numpy ufuncs. mode: 'full'
    (t + k - 1 samples), 'same' (t, centered like np.convolve), 'valid'
    (t - k + 1, requires t >= k). Oracle in tests: np.convolve per batch row.
    New scope beyond the reference (SURVEY §2.2 playground does spectrogram
    DSP only); the standard FFT-library companion op (cf. scipy.signal)."""
    x = jnp.asarray(x, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    t, k = x.shape[-1], h.shape[-1]
    if t < 1 or k < 1:
        raise ValueError(f"empty operand: x[-1]={t}, h[-1]={k}")
    if mode not in ("full", "same", "valid"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "valid" and t < k:
        raise ValueError(f"mode 'valid' requires len(x) >= len(h), "
                         f"got {t} < {k}")
    ln = t + k - 1
    m = max(4, 1 << (ln - 1).bit_length())
    ctx = _ctx_cache_get(m)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, m - t)])
    hp = jnp.pad(h, [(0, 0)] * (h.ndim - 1) + [(0, m - k)])
    xre, xim = ctx.forward_planes(xp)
    hre, him = ctx.forward_planes(hp)
    yre = xre * hre - xim * him
    yim = xre * him + xim * hre
    y = ctx.inverse_planes(yre, yim)[..., :ln]
    if mode == "full":
        return y
    if mode == "same":
        start = (k - 1) // 2
        return y[..., start:start + t]
    return y[..., k - 1:t]


_rfft_ctxs: dict = {}


def _ctx_cache_get(n_fft: int):
    from .api import RFFTContext
    if n_fft not in _rfft_ctxs:
        ctx = RFFTContext(n_fft, "float32")
        # A context built UNDER A TRACE (first stft call inside a user's
        # jit/shard_map) holds trace-local table values — caching it would
        # leak tracers into later eager calls (the device-array-cache class
        # CLAUDE.md bans; found by test_stft_sharded_matches_single_chip).
        # Use it for this trace only; cache the first eagerly-built one.
        if isinstance(jax.tree.leaves(ctx._fwd_tables)[0], jax.core.Tracer):
            return ctx
        _rfft_ctxs[n_fft] = ctx
    return _rfft_ctxs[n_fft]
