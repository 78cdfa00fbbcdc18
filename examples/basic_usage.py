"""Minimal tour of every public surface (runs on CPU or TPU).

Usage: python examples/basic_usage.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import watfft_tpu as wt

    rng = np.random.default_rng(0)

    # 1. context API, complex f32
    ctx = wt.create_fft_f32(1024)
    xre = rng.uniform(-1, 1, (4, 1024)).astype(np.float32)
    xim = rng.uniform(-1, 1, (4, 1024)).astype(np.float32)
    re, im = ctx.forward_planes(xre, xim)
    rre, rim = ctx.inverse_planes(re, im)
    print("complex roundtrip err:", float(jnp.max(jnp.abs(rre - xre))))

    # 2. TPU hot path: time-major [n, batch]
    re, im = ctx.forward_planes_nb(jnp.asarray(xre.T.copy()),
                                   jnp.asarray(xim.T.copy()))
    print("pallas kernel output:", re.shape, "on", list(re.devices()))

    # 3. real FFT
    rctx = wt.create_rfft_f32(1024)
    sig = rng.uniform(-1, 1, (4, 1024)).astype(np.float32)
    sre, sim = rctx.forward_planes(sig)
    back = rctx.inverse_planes(sre, sim)
    print("real roundtrip err:", float(jnp.max(jnp.abs(back - sig))))

    # 4. large N
    from watfft_tpu.ops.large import fft_large
    big = rng.uniform(-1, 1, 1 << 16).astype(np.float32)
    lre, lim = fft_large(big, np.zeros_like(big))
    print("large-N output:", lre.shape)

    # 5. STFT
    from watfft_tpu import stft
    p = stft.spectrogram(sig[0], n_fft=256, hop=64)
    print("spectrogram:", p.shape)


if __name__ == "__main__":
    main()
