"""On-chip probe: [real] n=256 cross-run variance + fused-vs-hybrid recheck,
and a prime-size Bluestein point.

Exp 33 flagged the hybrid rfft roundtrip at n=256 swinging 1.9-3.4x vs jnp
across bench runs — the widest spread of any row. This probe takes many
paired-interleaved reps in one process to separate (a) genuine bimodality in
the hybrid kernel from (b) tunnel drift, and re-measures fused/hybrid at 256
(Exp 32 table said 1.26, i.e. fused loses there).

Run directly on the chip: python tools/probe_rfft256.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from watfft_tpu.bench.harness import time_chain
from watfft_tpu.ops.pallas_rfft import (rfft_nb, irfft_nb, rfft_nb_fused,
                                        irfft_nb_fused)


def main():
    rng = np.random.default_rng(7)
    n = 256
    b = max(128, (1 << 21) // n)
    xr_t = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    xr = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))

    def hyb(c):
        re, im = rfft_nb(c)
        return irfft_nb(re, im)

    def fus(c):
        re, im = rfft_nb_fused(c)
        return irfft_nb_fused(re, im)

    def jr(c):
        return jnp.fft.irfft(jnp.fft.rfft(c), n=n)

    print(f"n={n} b={b}; 15 interleaved reps of hybrid/fused/jnp:")
    ts_h, ts_f, ts_j = [], [], []
    for i in range(15):
        th = time_chain(hyb, xr_t)
        tf = time_chain(fus, xr_t)
        tj = time_chain(jr, xr)
        ts_h.append(th)
        ts_f.append(tf)
        ts_j.append(tj)
        print(f"  rep{i:2d}: hybrid={th*1e6:7.1f}us fused={tf*1e6:7.1f}us "
              f"jnp={tj*1e6:7.1f}us  hyb-x{tj/th:4.2f} fus-x{tj/tf:4.2f} "
              f"fus/hyb={tf/th:4.2f}")
    med = lambda v: sorted(v)[len(v) // 2]
    print(f"medians: hybrid={med(ts_h)*1e6:.1f}us (min {min(ts_h)*1e6:.1f}, "
          f"max {max(ts_h)*1e6:.1f}) fused={med(ts_f)*1e6:.1f}us "
          f"jnp={med(ts_j)*1e6:.1f}us")
    print(f"median paired ratios: hybrid x{med([j/h for j, h in zip(ts_j, ts_h)]):.2f} "
          f"fused x{med([j/f for j, f in zip(ts_j, ts_f)]):.2f} "
          f"fused/hybrid {med([f/h for f, h in zip(ts_f, ts_h)]):.2f}")

    # ---- prime-size Bluestein point: n=1009 --------------------------------
    from watfft_tpu.ops.bluestein import bluestein_fft_nb
    for np2 in (1009,):
        bb = 2048
        yre_t = jnp.asarray(rng.uniform(-1, 1, (np2, bb)).astype(np.float32))
        yim_t = jnp.asarray(rng.uniform(-1, 1, (np2, bb)).astype(np.float32))
        yre = jnp.asarray(rng.uniform(-1, 1, (bb, np2)).astype(np.float32))
        yim = jnp.asarray(rng.uniform(-1, 1, (bb, np2)).astype(np.float32))

        def bl(c):
            a, d = c
            a, d = bluestein_fft_nb(a, d, inverse=False)
            return bluestein_fft_nb(a, d, inverse=True)

        def jbl(c):
            a, d = c
            z = jnp.fft.ifft(jnp.fft.fft(a + 1j * d))
            return z.real, z.imag
        rs = []
        for i in range(5):
            tb = time_chain(bl, (yre_t, yim_t))
            tj = time_chain(jbl, (yre, yim))
            rs.append((tb, tj))
            print(f"  prime n={np2} rep{i}: ours={tb*1e6:7.1f}us "
                  f"jnp={tj*1e6:7.1f}us x{tj/tb:.2f}")
        print(f"  prime n={np2} median ratio "
              f"x{med([j/b_ for b_, j in rs]):.2f}")


if __name__ == "__main__":
    main()
