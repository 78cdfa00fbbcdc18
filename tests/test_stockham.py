"""Kernel-variant tests for the flagship Stockham module.

The batch-major kernel variant (stockham_fft_bm) lost its on-chip bake-off
(Exp 44: the in-VMEM transpose is lane-shuffle-bound, 1.5-2.1x the XLA
boundary-transpose dispatch path) and is NOT planner-dispatched — but it
stays correctness-tested so the measured alternative cannot rot (the same
policy as the mxu-dft surface, registry.py).
"""

import numpy as np
import pytest

from watfft_tpu.ops.pallas_stockham import stockham_fft_bm


@pytest.mark.parametrize("n,b", [(16, 8), (64, 24), (256, 128), (1024, 8),
                                 (2048, 128)])
def test_batch_major_kernel(n, b):
    import jax.numpy as jnp
    rng = np.random.default_rng(44)
    x = (rng.uniform(-1, 1, (b, n)) + 1j * rng.uniform(-1, 1, (b, n)))
    xre = jnp.asarray(x.real.astype(np.float32))
    xim = jnp.asarray(x.imag.astype(np.float32))
    ore, oim = stockham_fft_bm(xre, xim, inverse=False)
    ref = np.fft.fft(x, axis=-1)
    err = np.max(np.abs((np.asarray(ore) + 1j * np.asarray(oim)) - ref))
    assert err / np.max(np.abs(ref)) < 1e-5
    ire, iim = stockham_fft_bm(
        jnp.asarray(np.ascontiguousarray(ref.real).astype(np.float32)),
        jnp.asarray(np.ascontiguousarray(ref.imag).astype(np.float32)),
        inverse=True)
    ierr = np.max(np.abs((np.asarray(ire) + 1j * np.asarray(iim)) - x))
    assert ierr / np.max(np.abs(x)) < 1e-5


def test_batch_major_rejects_bad_batch():
    import jax.numpy as jnp
    x = jnp.zeros((7, 16), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 8"):
        stockham_fft_bm(x, x)
