"""ctypes binding for the native C++ host layer (native/watfft_native.cpp).

Provides: an independent long-double O(N^2) DFT oracle, twiddle-pack and
DFT-matrix generators. The Python/numpy implementations remain the default;
the native layer's role is (a) cross-validation of the host tables against a
second implementation stack (reference analog: tools/wasm_compare.js) and
(b) fast plan generation for very large N. Builds on demand with `make -C
native`; all callers must handle `available() == False` gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATH = os.path.join(_ROOT, "native", "libwatfft_native.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        d = ctypes.POINTER(ctypes.c_double)
        f = ctypes.POINTER(ctypes.c_float)
        lib.wf_dft_c128.argtypes = [d, d, d, d, ctypes.c_int32, ctypes.c_int32]
        lib.wf_twiddle_pack_rows.argtypes = [ctypes.c_int32]
        lib.wf_twiddle_pack_rows.restype = ctypes.c_int32
        lib.wf_twiddle_pack.argtypes = [ctypes.c_int32, ctypes.c_int32, f, f]
        lib.wf_dft_matrix.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                      ctypes.c_double, d, d]
        lib.wf_version.restype = ctypes.c_int32
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def build(force: bool = False) -> bool:
    """Compile the native library with make; returns success."""
    global _load_failed
    if os.path.exists(_LIB_PATH) and not force:
        _load_failed = False
        return _try_load() is not None
    try:
        subprocess.run(["make", "-C", os.path.join(_ROOT, "native")],
                       check=True, capture_output=True, timeout=120)
        _load_failed = False
        return _try_load() is not None
    except Exception:
        return False


def available() -> bool:
    return _try_load() is not None


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def dft(x: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Independent O(N^2) long-double DFT oracle (unscaled inverse)."""
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native library not built; run watfft_tpu.native.build()")
    x = np.asarray(x, np.complex128)
    n = x.shape[-1]
    flat = x.reshape(-1, n)
    out = np.empty_like(flat)
    for i in range(flat.shape[0]):
        xre = np.ascontiguousarray(flat[i].real)
        xim = np.ascontiguousarray(flat[i].imag)
        ore = np.empty(n, np.float64)
        oim = np.empty(n, np.float64)
        lib.wf_dft_c128(_dp(xre), _dp(xim), _dp(ore), _dp(oim),
                        np.int32(n), np.int32(1 if inverse else -1))
        out[i] = ore + 1j * oim
    return out.reshape(x.shape)


def twiddle_pack(n: int, inverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """Native counterpart of ops.pallas_stockham.make_twiddle_pack."""
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native library not built; run watfft_tpu.native.build()")
    rows = lib.wf_twiddle_pack_rows(np.int32(n))
    re = np.empty(rows, np.float32)
    im = np.empty(rows, np.float32)
    lib.wf_twiddle_pack(np.int32(n), np.int32(1 if inverse else 0),
                        _fp(re), _fp(im))
    return re.reshape(-1, 1), im.reshape(-1, 1)


def dft_matrix(n: int, sign: int, scale: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native library not built; run watfft_tpu.native.build()")
    wre = np.empty((n, n), np.float64)
    wim = np.empty((n, n), np.float64)
    lib.wf_dft_matrix(np.int32(n), np.int32(sign), np.float64(scale),
                      _dp(wre), _dp(wim))
    return wre, wim
