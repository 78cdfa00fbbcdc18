"""TPU-native f64-class FFT via double-f32 ("two-float") arithmetic.

TPUs have no native f64; the reference's f64 tier (modules/fft_combined.wat,
fft_real_combined.wat) therefore maps to compensated double-f32 arithmetic:
every value is an (hi, lo) f32 pair carrying ~48 mantissa bits, using
error-free transformations (Knuth two_sum, Dekker/Veltkamp two_prod). This
runs on the VPU at full lane width — the TPU-native alternative to the
CPU-fallback f64 path in api.py.

Accuracy: twiddles are split from f64 host values into hi+lo pairs, so the
end-to-end max-rel error lands at ~1e-12..1e-13 vs the f64 oracle — beating
the reference's f64 plateau of ~5e-11 (its Taylor-series trig limited it;
SURVEY.md §6) and comfortably inside the 1e-9 test threshold.

Note: compiled with XLA's excess-precision allowance, a*b-p may contract to
fma(a,b,-p), which makes two_prod's error term EXACT rather than breaking
it; accuracy is asserted empirically by tests/test_doublefloat.py either way.

Kernel structure mirrors ops/pallas_stockham.py with radix-4 stages (df ops
are ~10x the flops of f32 ops, so this tier is compute-bound and smaller
radices keep the expression tree manageable) over FOUR planes
(re_hi, re_lo, im_hi, im_lo), batch on lanes, time-major [n, b].
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config

__all__ = ["df_fft_nb", "split_f64", "merge_f64"]

_SPLIT = np.float32(4097.0)  # Veltkamp factor for f32: 2^12 + 1


# -- error-free transformations ---------------------------------------------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    s = a + b
    return s, b - (s - a)


def _two_prod(a, b):
    p = a * b
    t = a * _SPLIT
    ah = t - (t - a)
    al = a - ah
    t = b * _SPLIT
    bh = t - (t - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def df_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + xl + yl
    return _quick_two_sum(s, e)


def df_sub(xh, xl, yh, yl):
    return df_add(xh, xl, -yh, -yl)


def df_mul(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return _quick_two_sum(p, e)


def df_cmul(arh, arl, aih, ail, brh, brl, bih, bil):
    """(ar + i*ai) * (br + i*bi) on df planes."""
    t1h, t1l = df_mul(arh, arl, brh, brl)
    t2h, t2l = df_mul(aih, ail, bih, bil)
    reh, rel = df_sub(t1h, t1l, t2h, t2l)
    t3h, t3l = df_mul(arh, arl, bih, bil)
    t4h, t4l = df_mul(aih, ail, brh, brl)
    imh, iml = df_add(t3h, t3l, t4h, t4l)
    return reh, rel, imh, iml


# -- host-side value splitting ----------------------------------------------

def split_f64(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """f64 array -> (hi, lo) f32 planes with hi + lo == x to f32-pair accuracy."""
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def merge_f64(hi, lo) -> np.ndarray:
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


# -- plan ---------------------------------------------------------------------

def _df_stage_plan(n: int) -> list[tuple[int, int]]:
    """Mixed-radix plan. On TPU: the f32 policy (Exp 4/15/16) — radix-16
    stages + one {2,4,8} remainder (radix-8 leads; 2/4 at position 1); fewer
    stages halve the 4-plane permute passes (91 -> 28us at n=1024). Under
    interpret/CPU: radix-4 + remainder-2 — the radix-16 df expression is
    ~3.3x more expensive to trace+compile (~50s vs ~15s per size at n=4096,
    Exp 18) with identical accuracy, and registry-driven CPU tests sweep
    many sizes."""
    if config.df_max_radix() >= 16:
        from .pallas_stockham import stage_plan as _f32_plan
        return _f32_plan(n)
    m = n.bit_length() - 1
    radices: list[int] = []
    while m >= 2:
        radices.append(4)
        m -= 2
    if m:
        if not radices:
            radices.append(2)
        else:
            radices.insert(1, 2)  # rem-2 at position 1 (f32 policy, Exp 15)
    stages: list[tuple[int, int]] = []
    l = 1
    for r in radices:
        stages.append((r, l))
        l *= r
    return stages


def _df_twiddle_pack(n: int, inverse: bool):
    """Per-stage twiddle columns as FOUR planes (re_hi, re_lo, im_hi, im_lo),
    f64 host math with mod-4l phase reduction; folded 1/n on the inverse's
    final stage."""
    sign = +1.0 if inverse else -1.0
    cols = {"rh": [], "rl": [], "ih": [], "il": []}
    offsets = []
    off = 0
    stages = _df_stage_plan(n)
    for idx, (r, l) in enumerate(stages):
        if l == 1:
            offsets.append(-1)
            continue
        rows = n // r
        k = np.arange(rows, dtype=np.int64) % l
        scale = (1.0 / n) if (inverse and idx == len(stages) - 1) else 1.0
        for p in range(1, r):
            ang = sign * 2.0 * np.pi * ((p * k) % (r * l)) / (r * l)
            re = scale * np.cos(ang)
            im = scale * np.sin(ang)
            rh, rl = split_f64(re)
            ih, il = split_f64(im)
            cols["rh"].append(rh); cols["rl"].append(rl)
            cols["ih"].append(ih); cols["il"].append(il)
        offsets.append(off)
        off += (r - 1) * rows
    if not cols["rh"]:
        cols = {"rh": [np.ones(1, np.float32)], "rl": [np.zeros(1, np.float32)],
                "ih": [np.zeros(1, np.float32)], "il": [np.zeros(1, np.float32)]}
    packed = tuple(np.concatenate(cols[k]).reshape(-1, 1)
                   for k in ("rh", "rl", "ih", "il"))
    return packed, offsets


# -- stages -------------------------------------------------------------------

def _df_interleave(parts, g, l, b):
    n = len(parts) * g * l
    if l >= 8:
        out = jnp.stack([p.reshape(g, l, b) for p in parts], axis=1)
    else:
        out = jnp.stack([p.reshape(g, l * b) for p in parts], axis=1)
    return out.reshape(n, b)


def _df_interleave3(parts, g, l, s, w):
    """3D small-n variant: keeps the (8, lanes) tiled pair dense (Exp 10)."""
    n = len(parts) * g * l
    out = jnp.stack([p.reshape(g, l, s, w) for p in parts], axis=1)
    return out.reshape(n, s, w)


def _df_stage(planes, n, r, l, tw, inverse, scale0):
    """One stage on (reh, rel, imh, iml) planes; 2D [n, b] or 3D [n, 8, w]."""
    q = n // r
    three_d = planes[0].ndim == 3
    parts = [[pl_[p * q:(p + 1) * q] for pl_ in planes] for p in range(r)]
    if tw is not None:
        trh, trl, tih, til = tw
        for p in range(1, r):
            wrh = trh[(p - 1) * q:p * q]; wrl = trl[(p - 1) * q:p * q]
            wih = tih[(p - 1) * q:p * q]; wil = til[(p - 1) * q:p * q]
            if three_d:
                wrh, wrl = wrh.reshape(q, 1, 1), wrl.reshape(q, 1, 1)
                wih, wil = wih.reshape(q, 1, 1), wil.reshape(q, 1, 1)
            arh, arl, aih, ail = parts[p]
            parts[p] = list(df_cmul(arh, arl, aih, ail, wrh, wrl, wih, wil))
    if scale0 is not None:
        sh, sl = scale0
        arh, arl, aih, ail = parts[0]
        rh, rl = df_mul(arh, arl, sh, sl)
        ih, il = df_mul(aih, ail, sh, sl)
        parts[0] = [rh, rl, ih, il]
        if tw is None:
            for p in range(1, r):
                arh, arl, aih, ail = parts[p]
                rh, rl = df_mul(arh, arl, sh, sl)
                ih, il = df_mul(aih, ail, sh, sl)
                parts[p] = [rh, rl, ih, il]
    outs = _df_small_dft(parts, inverse)
    g = n // (r * l)
    if three_d:
        s, w = planes[0].shape[-2], planes[0].shape[-1]
        return tuple(_df_interleave3([o[i] for o in outs], g, l, s, w)
                     for i in range(4))
    b = planes[0].shape[-1]
    return tuple(_df_interleave([o[i] for o in outs], g, l, b) for i in range(4))


def _df_small_dft(parts, inverse):
    """R-point DFT across df parts (R power of two) via the radix-2
    recursion; non-exact twiddle constants are df (hi, lo) scalar pairs
    split from f64, so accuracy stays at the ~1e-15 tier."""
    r = len(parts)
    if r == 1:
        return parts
    evens = _df_small_dft(parts[0::2], inverse)
    odds = _df_small_dft(parts[1::2], inverse)
    half = r // 2
    sign = +1.0 if inverse else -1.0
    out = [None] * r
    for q in range(half):
        ang = sign * 2.0 * np.pi * q / r
        oq = odds[q]
        if q == 0:
            t = oq
        elif 4 * q == r:
            t = _mul_i(oq, inverse)
        else:
            wrh, wrl = split_f64(np.array([np.cos(ang)]))
            wih, wil = split_f64(np.array([np.sin(ang)]))
            t = list(df_cmul(oq[0], oq[1], oq[2], oq[3],
                             jnp.float32(wrh[0]), jnp.float32(wrl[0]),
                             jnp.float32(wih[0]), jnp.float32(wil[0])))
        out[q] = _cadd(evens[q], t)
        out[q + half] = _csub(evens[q], t)
    return out


def _cadd(a, b):
    rh, rl = df_add(a[0], a[1], b[0], b[1])
    ih, il = df_add(a[2], a[3], b[2], b[3])
    return [rh, rl, ih, il]


def _csub(a, b):
    rh, rl = df_sub(a[0], a[1], b[0], b[1])
    ih, il = df_sub(a[2], a[3], b[2], b[3])
    return [rh, rl, ih, il]


def _mul_i(a, inverse):
    # forward: -i * a = (im, -re); inverse: +i * a = (-im, re)
    if inverse:
        return [-a[2], -a[3], a[0], a[1]]
    return [a[2], a[3], -a[0], -a[1]]


# -- kernel -------------------------------------------------------------------

def _df_kernel(n, inverse, offsets, stages, use3d,
               rh_ref, rl_ref, ih_ref, il_ref,
               trh_ref, trl_ref, tih_ref, til_ref,
               orh_ref, orl_ref, oih_ref, oil_ref):
    planes = (rh_ref[:], rl_ref[:], ih_ref[:], il_ref[:])
    if use3d:
        w = planes[0].shape[-1] // 8
        planes = tuple(p.reshape(n, 8, w) for p in planes)
    inv_h, inv_l = split_f64(np.array([1.0 / n]))
    scale = (jnp.float32(inv_h[0]), jnp.float32(inv_l[0]))
    for idx, (r, l) in enumerate(stages):
        is_final = idx == len(stages) - 1
        tw = None
        if offsets[idx] >= 0:
            o = offsets[idx]
            rows = (r - 1) * (n // r)
            tw = (trh_ref[o:o + rows], trl_ref[o:o + rows],
                  tih_ref[o:o + rows], til_ref[o:o + rows])
        scale0 = scale if (inverse and is_final) else None
        planes = _df_stage(planes, n, r, l, tw, inverse, scale0)
    if use3d:
        planes = tuple(p.reshape(n, -1) for p in planes)
    orh_ref[:] = planes[0]
    orl_ref[:] = planes[1]
    oih_ref[:] = planes[2]
    oil_ref[:] = planes[3]


@functools.partial(jax.jit, static_argnames=("n", "inverse", "tile_b", "interpret"))
def _df_call(rh, rl, ih, il, tws, n, inverse, tile_b, interpret=False):
    b = rh.shape[-1]
    stages = tuple(_df_stage_plan(n))
    offsets = _df_twiddle_pack(n, inverse)[1]
    use3d = n <= config.USE3D_MAX_N and tile_b >= 1024 and tile_b % 8 == 0
    kernel = functools.partial(_df_kernel, n, inverse, offsets, stages, use3d)
    grid = (b // tile_b,)
    block = pl.BlockSpec((n, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(tws[0].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, b), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block] * 4 + [twspec] * 4,
        out_specs=[block] * 4,
        out_shape=[out_shape] * 4,
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(rh, rl, ih, il, *tws)


class _Cache:
    _c: dict = {}

    @classmethod
    def get(cls, n, inverse):
        key = (n, inverse)
        if key not in cls._c:
            cls._c[key] = _df_twiddle_pack(n, inverse)[0]  # numpy only
        return cls._c[key]


def _df_pick_tile(n: int, b: int) -> int:
    """df stages hold ~2x the planes of the f32 kernel; halve the budget.
    n <= 128 uses wide tiles for the 3D small-n mode (Exp 10)."""
    if n <= 128:
        tb = 1024
    else:
        tb = 128
    while tb > b and tb > 128:
        tb //= 2
    return tb


def _df_post_twiddles(n: int, inverse: bool):
    m = n // 2
    sign = +1.0 if inverse else -1.0
    k = np.arange(m + (0 if inverse else 1))
    ang = sign * 2.0 * np.pi * k / n
    wrh, wrl = split_f64(np.cos(ang))
    wih, wil = split_f64(np.sin(ang))
    return tuple(a.reshape(-1, 1) for a in (wrh, wrl, wih, wil))


class _PostCache:
    _c: dict = {}

    @classmethod
    def get(cls, n, inverse):
        key = (n, inverse)
        if key not in cls._c:
            cls._c[key] = _df_post_twiddles(n, inverse)  # numpy only
        return cls._c[key]


def df_rfft_nb(xh, xl):
    """Double-f32 real forward FFT: hi/lo real planes [n, batch] ->
    (Xre_h, Xre_l, Xim_h, Xim_l) with n//2+1 rows.

    TPU-native analog of the reference's f64 real module
    (modules/fft_real_combined.wat rfft :953-1052): pack-as-complex df core
    kernel + Hermitian recombination in df arithmetic (the df_* helpers are
    plain jnp ops, so the post runs XLA-fused outside the kernel)."""
    n, b = xh.shape[-2], xh.shape[-1]
    m = n // 2
    zrh, zrl = xh[0::2], xl[0::2]
    zih, zil = xh[1::2], xl[1::2]
    zrh, zrl, zih, zil = df_fft_nb(zrh, zrl, zih, zil)
    wrh, wrl, wih, wil = (jnp.asarray(a) for a in _PostCache.get(n, False))
    flip = lambda a: jnp.flip(a[1:], axis=0)
    # core rows k = 1..m-1: A = Z[k], B = Z[m-k]
    arh, arl, aih, ail = zrh[1:], zrl[1:], zih[1:], zil[1:]
    brh, brl = flip(zrh), flip(zrl)
    bih, bil = flip(zih), flip(zil)
    half = (jnp.float32(0.5), jnp.float32(0.0))
    erh, erl = df_mul(*df_add(arh, arl, brh, brl), *half)
    eih, eil = df_mul(*df_add(aih, ail, -bih, -bil), *half)
    orh, orl = df_mul(*df_add(aih, ail, bih, bil), *half)
    oih, oil = df_mul(*df_add(-arh, -arl, brh, brl), *half)
    wr = (wrh[1:m], wrl[1:m])
    wi = (wih[1:m], wil[1:m])
    xr_h, xr_l, xi_h, xi_l = df_cmul(orh, orl, oih, oil,
                                     wr[0], wr[1], wi[0], wi[1])
    xr_h, xr_l = df_add(erh, erl, xr_h, xr_l)
    xi_h, xi_l = df_add(eih, eil, xi_h, xi_l)
    # DC and Nyquist from Z[0]
    dc_h, dc_l = df_add(zrh[:1], zrl[:1], zih[:1], zil[:1])
    ny_h, ny_l = df_add(zrh[:1], zrl[:1], -zih[:1], -zil[:1])
    zero = jnp.zeros_like(dc_h)
    cat = lambda a, bb, c: jnp.concatenate([a, bb, c], axis=0)
    return (cat(dc_h, xr_h, ny_h), cat(dc_l, xr_l, ny_l),
            cat(zero, xi_h, zero), cat(zero, xi_l, zero))


def df_irfft_nb(xrh, xrl, xih, xil):
    """Double-f32 inverse real FFT: [m+1, batch] hi/lo spectrum planes ->
    real hi/lo planes [2m, batch] (normalized). Fixes (rather than
    reproduces) the reference's missing f64 irfft export (SURVEY.md §2.2)."""
    m1, b = xrh.shape[-2], xrh.shape[-1]
    m = m1 - 1
    n = 2 * m
    wrh, wrl, wih, wil = (jnp.asarray(a) for a in _PostCache.get(n, True))
    # A = X[k], B = conj(X[m-k]), k = 0..m-1
    arh, arl, aih, ail = xrh[:m], xrl[:m], xih[:m], xil[:m]
    mirror = lambda a: jnp.concatenate([a[m:m + 1], jnp.flip(a[1:m], axis=0)], axis=0)
    brh, brl = mirror(xrh), mirror(xrl)
    bih, bil = -mirror(xih), -mirror(xil)
    half = (jnp.float32(0.5), jnp.float32(0.0))
    erh, erl = df_mul(*df_add(arh, arl, brh, brl), *half)
    eih, eil = df_mul(*df_add(aih, ail, bih, bil), *half)
    orh, orl = df_mul(*df_add(-aih, -ail, bih, bil), *half)
    oih, oil = df_mul(*df_add(arh, arl, -brh, -brl), *half)
    zrh, zrl, zih, zil = df_cmul(orh, orl, oih, oil,
                                 wrh[:m], wrl[:m], wih[:m], wil[:m])
    zrh, zrl = df_add(erh, erl, zrh, zrl)
    zih, zil = df_add(eih, eil, zih, zil)
    zrh, zrl, zih, zil = df_fft_nb(zrh, zrl, zih, zil, inverse=True)
    inter = lambda re, im: jnp.stack([re, im], axis=1).reshape(n, b)
    return inter(zrh, zih), inter(zrl, zil)


def df_fft_nb(rh, rl, ih, il, inverse: bool = False):
    """Double-f32 batched FFT on time-major planes [n, batch].

    Input/output: four f32 planes (re_hi, re_lo, im_hi, im_lo) whose hi+lo
    sums are the f64-class values. batch must be a multiple of 128.
    """
    n, b = rh.shape[-2], rh.shape[-1]
    if b % 128 != 0:
        raise ValueError(f"batch (last axis) must be a multiple of 128, got {b}")
    tws = _Cache.get(n, inverse)
    tile_b = _df_pick_tile(n, b)
    if b % tile_b != 0:
        tile_b = 128
    interpret = config.FORCE_INTERPRET or jax.default_backend() != "tpu"
    return _df_call(rh, rl, ih, il, tws, n, inverse, tile_b,
                    interpret=interpret)
