"""Constant-network and twiddle-table validation.

Port of tests/twiddle_validation.test.js (reference: parses hardcoded
W_N^k constants out of the WAT source and checks them against computed
values — source-level lint-as-test). Here the 'hardcoded constants' are
(a) the scalar twiddles inside the _small_dft butterfly network and (b)
the packed per-stage twiddle columns; both are validated against exact
f64 DFT math.
"""

import numpy as np
import pytest

from watfft_tpu.ops.pallas_stockham import (
    _small_dft, make_twiddle_pack, stage_plan,
)


@pytest.mark.parametrize("r", [2, 4, 8, 16])
@pytest.mark.parametrize("inverse", [False, True])
def test_small_dft_network_is_exact(r, inverse):
    """Feed each impulse through the butterfly network: output column p must
    equal w_R^{p*q} exactly (to f32 rounding)."""
    sign = +1.0 if inverse else -1.0
    for p in range(r):
        parts_re = [np.full((1, 1), 1.0 if j == p else 0.0, np.float32)
                    for j in range(r)]
        parts_im = [np.zeros((1, 1), np.float32) for _ in range(r)]
        out_re, out_im = _small_dft(parts_re, parts_im, inverse)
        got = np.array([complex(out_re[q][0, 0], out_im[q][0, 0])
                        for q in range(r)])
        expected = np.exp(sign * 2j * np.pi * p * np.arange(r) / r)
        np.testing.assert_allclose(got, expected, atol=3e-7)


@pytest.mark.parametrize("n,three_d", [(64, False), (256, False),
                                       (512, True), (1024, False),
                                       (4096, False)])
@pytest.mark.parametrize("inverse", [False, True])
def test_twiddle_pack_values(n, three_d, inverse):
    """Every packed column entry equals scale * w_{R*l}^{p*(row mod l)}
    computed in f64. (512, three_d=True) pins the DMA-3D layout's own plan
    table (_PLAN_OVERRIDES_3D, Exp 46)."""
    sign = +1.0 if inverse else -1.0
    re, im, offsets = make_twiddle_pack(n, inverse, three_d)
    stages = stage_plan(n, three_d)
    got = re.ravel() + 1j * im.ravel()
    for idx, (r, l) in enumerate(stages):
        if offsets[idx] < 0:
            continue
        rows = n // r
        scale = (1.0 / n) if (inverse and idx == len(stages) - 1) else 1.0
        k = np.arange(rows) % l
        for p in range(1, r):
            ang = sign * 2.0 * np.pi * p * k / (r * l)
            expected = scale * np.exp(1j * ang)
            block = got[offsets[idx] + (p - 1) * rows:
                        offsets[idx] + p * rows]
            np.testing.assert_allclose(block, expected, atol=3e-7)


def test_stage_plans_multiply_out():
    for three_d in (False, True):
        for n in [2, 8, 16, 64, 512, 4096, 1 << 14]:
            prod = 1
            for r, l in stage_plan(n, three_d):
                assert l == prod, f"stage l mismatch at n={n}"
                prod *= r
            assert prod == n
