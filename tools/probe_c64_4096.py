"""Probe (Exp 53): decompose the two weakest rows of the round-5 headline
run — complex n=64 (2.73x) and n=4096 (3.97x; the SAME row measured 7.8x
in the round-4 snapshot) — into ours-vs-duplex-floor and
baseline-vs-its-neighbors, per Exp 49's method, before treating either as
a kernel deficiency.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from watfft_tpu.bench.harness import paired_chain, enable_compile_cache
from watfft_tpu.ops.pallas_stockham import stockham_fft_nb

enable_compile_cache()
rng = np.random.default_rng(6)
TOTAL = 1 << 21
BW = 1.638e12  # duplex clamp bandwidth per direction (bench.py)

for n in (32, 64, 128, 2048, 4096):
    b = TOTAL // n
    if n <= 2048:  # native 3D layout, as the headline sweep uses
        xre = jnp.asarray(rng.uniform(-1, 1, (n, 8, b // 8)).astype(np.float32))
        xim = jnp.asarray(rng.uniform(-1, 1, (n, 8, b // 8)).astype(np.float32))
    else:
        xre = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
        xim = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    # NB: complex dtypes must NEVER touch the axon device (CLAUDE.md);
    # jnp sides build complex strictly inside the jitted chain
    xjre = jnp.asarray(np.asarray(xre).reshape(n, b).T.copy())
    xjim = jnp.asarray(np.asarray(xim).reshape(n, b).T.copy())

    def ours(c):
        a, d = c
        a, d = stockham_fft_nb(a, d, inverse=False)
        return stockham_fft_nb(a, d, inverse=True)

    def theirs(c):
        a, d = c
        z = jnp.fft.ifft(jnp.fft.fft(a + 1j * d))
        return jnp.real(z), jnp.imag(z)

    t_o, t_j, r, _ = paired_chain(ours, (xre, xim), theirs, (xjre, xjim),
                                  reps=7)
    floor = 4 * TOTAL * 4 / BW  # read+write both planes, fwd+inv, duplex
    print(f"n={n:5d} b={b:6d}: ours={t_o*1e6:7.1f}us ({t_o/floor:4.2f}x floor)"
          f"  jnp={t_j*1e6:7.1f}us ({t_j*1e9/(2*TOTAL*np.log2(n)):5.2f} ns/(el*log2n))"
          f"  x{r:.2f}", flush=True)
