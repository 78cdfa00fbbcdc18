"""Native C++ layer cross-validation (tools/wasm_compare.js analog).

The native library is an INDEPENDENT implementation stack (long-double C++)
cross-checking the numpy host tables and oracle — a disagreement here means
one of the two stacks has a real bug. Builds the library on first run.
"""

import numpy as np
import pytest

from watfft_tpu import native
from watfft_tpu.ops.pallas_stockham import make_twiddle_pack
from watfft_tpu.plan import dft_matrix as np_dft_matrix
from watfft_tpu.reference import dft as ref

pytestmark = pytest.mark.skipif(not native.build(),
                                reason="native toolchain unavailable")


def test_native_dft_matches_numpy_oracle():
    rng = ref.seeded_rng(11)
    for n in (8, 64, 256):
        x = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
        got = native.dft(x)
        expected = ref.dft(x)
        assert np.max(np.abs(got - expected)) < n * 1e-13


def test_native_twiddle_pack_matches_python():
    # includes the Exp 39 radix-32/64 override sizes (32/1024/2048/4096/8192)
    for n in (16, 32, 64, 128, 1024, 2048, 4096, 8192):
        for inverse in (False, True):
            nre, nim = native.twiddle_pack(n, inverse)
            pre, pim, _ = make_twiddle_pack(n, inverse)
            assert nre.shape == pre.shape
            np.testing.assert_allclose(nre, pre, atol=2e-7)
            np.testing.assert_allclose(nim, pim, atol=2e-7)


def test_native_dft_matrix_matches_python():
    for n in (16, 128):
        for sign in (-1, 1):
            nre, nim = native.dft_matrix(n, sign, 1.0)
            pre, pim = np_dft_matrix(n, float(sign))
            np.testing.assert_allclose(nre, pre, atol=1e-14)
            np.testing.assert_allclose(nim, pim, atol=1e-14)
