"""Exp 47 exactness pin: MXU selection dots vs the parity select.

The 2D real path's deinterleave (forward) / reinterleave (inverse) can run
either as Mosaic sublane parity selects or as blocked 0/1 selection
matmuls on the MXU (ops/pallas_rfft.py:_sel_dot — exact 3-pass bf16
splitting inside compiled kernels, HIGHEST f32 under interpret). Exp 47's
exactness claim, pinned here at the right scope:

1. The selection OP itself is BIT-EXACT — a 0/1 dot reproduces each f32
   datum to the bit, including the bf16x3 decomposition (each partial sum
   is a bit-truncation of the original; non-overlapping mantissa ranges).
2. END-TO-END, toggling the dispatch table swaps the whole compiled
   program, and XLA/Mosaic may contract the SAME surrounding stage
   arithmetic differently (mul+add vs fma) in the two variants — measured
   ~1 ulp on ~1-6% of elements (this test's development found exactly
   that; it is a compiler-variant effect identical in kind to retiling,
   NOT a selection error). So the end-to-end pin is <= 2 ulp, while the
   op-level pin is zero.

So the dispatch tables (config.RFFT_MXU_SELECT_{FWD,INV}_SIZES) are pure
speed knobs whose accuracy surface is the same as any recompile.

Backends: under the CI CPU pin this exercises the interpret-mode
_sel_dot_exact path; a chip spot-run (`WATFFT_TEST_TPU=1 python -m pytest
tests/test_mxu_select.py -q`, see conftest.py) exercises the real bf16x3
Mosaic path — the case VERDICT r4 #9 asked to pin (previously proven by
probe only, tools/probe_real4096f.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from watfft_tpu import config
from watfft_tpu.ops import pallas_rfft as pr

# 2 ulp at the result's magnitude scale (f32 mantissa 2^-23): the allowed
# program-variant contraction difference; the select contributes ZERO.
ULP2 = 2.0 ** -22


def _toggle(name, value):
    old = getattr(config, name)
    setattr(config, name, value)
    return old


@pytest.mark.parametrize("n", [256, 1024])
@pytest.mark.parametrize("family", ["hybrid", "fused"])
def test_mxu_select_forward_2ulp(n, family):
    rng = np.random.default_rng(47)
    x = jnp.asarray(rng.uniform(-1, 1, (n, 256)).astype(np.float32))
    fwd = pr._rfft_impl if family == "hybrid" else pr._rfft_fused_impl
    old = _toggle("RFFT_MXU_SELECT_FWD_SIZES", frozenset())
    try:
        re0, im0 = fwd(x)
        config.RFFT_MXU_SELECT_FWD_SIZES = frozenset({n})
        re1, im1 = fwd(x)
    finally:
        config.RFFT_MXU_SELECT_FWD_SIZES = old
    scale = float(np.abs(np.asarray(re0)).max())
    for a, b in ((re0, re1), (im0, im1)):
        d = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert d <= ULP2 * scale, (d, scale)


@pytest.mark.parametrize("n", [256, 1024])
@pytest.mark.parametrize("family", ["hybrid", "fused"])
def test_mxu_select_inverse_2ulp(n, family):
    rng = np.random.default_rng(48)
    m = n // 2
    sre = jnp.asarray(rng.uniform(-1, 1, (m + 1, 256)).astype(np.float32))
    sim = jnp.asarray(rng.uniform(-1, 1, (m + 1, 256)).astype(np.float32))
    inv = pr._irfft_impl if family == "hybrid" else pr._irfft_fused_impl
    old = _toggle("RFFT_MXU_SELECT_INV_SIZES", frozenset())
    try:
        y0 = inv(sre, sim)
        config.RFFT_MXU_SELECT_INV_SIZES = frozenset({n})
        y1 = inv(sre, sim)
    finally:
        config.RFFT_MXU_SELECT_INV_SIZES = old
    scale = float(np.abs(np.asarray(y0)).max())
    d = np.abs(np.asarray(y0) - np.asarray(y1)).max()
    assert d <= ULP2 * scale, (d, scale)


def test_sel_dot_bf16x3_is_exact_on_selection_matrices():
    """The op-level BIT-EXACTNESS pin (claim 1): for a 0/1 matrix,
    dot(D, xh) + dot(D, xm) + dot(D, xl) recombines every f32 datum
    exactly (each partial sum is a bit-truncation of the original —
    non-overlapping mantissa ranges). On a TPU backend this runs the real
    three bf16 MXU passes; on CPU, the same decomposition through XLA
    (which happened not to refactor it — the in-kernel guard against the
    refactoring is _sel_dot_exact, ops/pallas_rfft.py:68-77)."""
    rng = np.random.default_rng(49)
    g = 128
    x = rng.uniform(-1, 1, (g, 256)).astype(np.float32)
    # worst-case mantissas too: tiny magnitudes and a full-mantissa value
    x[0] = np.float32(1.0) - np.float32(2.0) ** -24
    x[1] = np.float32(1e-30)
    dm = pr._DCache.get(g)
    got = np.asarray(pr._sel_dot(jnp.asarray(dm), jnp.asarray(x)))
    want = dm @ x  # exact: one nonzero per row
    np.testing.assert_array_equal(got, want)


def test_mxu_deint_reint_are_exact_permutations():
    """_mxu_deint/_mxu_reint with the exact dot are pure row permutations:
    bit-equal to numpy strided indexing, and exact inverses of each other."""
    rng = np.random.default_rng(50)
    n = 512
    x = rng.uniform(-1, 1, (n, 256)).astype(np.float32)
    dm = jnp.asarray(pr._DCache.get(128))
    dmt = jnp.asarray(pr._DCache.get(128, transpose=True))
    ev, od = pr._mxu_deint(jnp.asarray(x), dm, dot=pr._sel_dot_exact)
    np.testing.assert_array_equal(np.asarray(ev), x[0::2])
    np.testing.assert_array_equal(np.asarray(od), x[1::2])
    back = pr._mxu_reint(ev, od, dmt, dot=pr._sel_dot_exact)
    np.testing.assert_array_equal(np.asarray(back), x)
