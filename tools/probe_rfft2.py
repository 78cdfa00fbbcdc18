"""Probe: fused 2D real FFT (ops/fft2.rfft2_planes) vs the round-4 composed
column path vs jnp.fft.rfft2 — roundtrip chains at the bench shape
[128, 256, 256] plus a square 512 point. Paired interleaved reps.

Context: VERDICT r4 Weak #5 follow-up — the composed row measured 1.8x
(under the 2x bar). The fused path packs along w, runs ONE half-width
fft2 (cube/k2 kernels), and one 2D Hermitian recombination pass.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from watfft_tpu.bench.harness import paired_chain, enable_compile_cache
from watfft_tpu.ops.fft2 import rfft2_planes, irfft2_planes
from watfft_tpu.parallel.sharded import _local_rfft, _local_irfft, _local_fft

enable_compile_cache()
rng = np.random.default_rng(7)


def composed_step(c):
    def _cols(re, im, inverse):
        re = jnp.swapaxes(re, -1, -2)
        im = jnp.swapaxes(im, -1, -2)
        re, im = _local_fft(re, im, inverse)
        return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)
    re, im = _local_rfft(c)
    re, im = _cols(re, im, False)
    re, im = _cols(re, im, True)
    return _local_irfft(re, im)


def fused_step(c):
    re, im = rfft2_planes(c)
    return irfft2_planes(re, im)


for (b, h, w) in [(128, 256, 256), (32, 512, 512)]:
    x = jnp.asarray(rng.uniform(-1, 1, (b, h, w)).astype(np.float32))

    def jstep(c):
        z = jnp.fft.rfft2(c)
        return jnp.fft.irfft2(z, s=(h, w))

    # correctness gate first (chip): fused vs numpy f64
    got = np.asarray(rfft2_planes(x)[0])
    ref = np.fft.rfft2(np.asarray(x).astype(np.float64)).real
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))

    t_f, t_j, r_fj, _ = paired_chain(fused_step, x, jstep, x, reps=5)
    t_c, t_j2, r_cj, _ = paired_chain(composed_step, x, jstep, x, reps=5)
    print(f"[{b},{h},{w}] rel_err={err:.2e}  "
          f"fused={t_f*1e6:.1f}us ({r_fj:.2f}x jnp)  "
          f"composed={t_c*1e6:.1f}us ({r_cj:.2f}x jnp)  "
          f"jnp={t_j*1e6:.1f}us  fused/composed={t_c/t_f:.2f}x", flush=True)
