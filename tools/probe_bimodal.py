"""Probe the n=512 bench bimodality (round-4, follow-up to the HBM audit).

Snapshot rows for stockham/rfft n=512 (and stockham n=4096) show per-rep
samples spanning 4-10x WITHIN one run (cv 0.57-0.64) while the jnp rows
timed by the same ChainTimer are stable (cv <= 0.13). The outliers are
mostly HIGH ops/s, i.e. the measured slope came out too SMALL — consistent
with the short-chain timing t(r1) being inflated by a tunnel delay spike
(slope = (t2-t1)/(r2-r1)).

This probe records the RAW t(r1)/t(r2) timings for many slope reps so we
can see whether the spread lives in the host timings (tunnel) or would
persist with perfect timing (real device bimodality — which a fori_loop
chain can't produce, since the whole chain is one compiled program).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n, b = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (512, 4096)
    from watfft_tpu.ops.pallas_stockham import stockham_fft_nb
    from watfft_tpu.bench.harness import ChainTimer, enable_compile_cache
    enable_compile_cache()

    rng = np.random.default_rng(0)
    host_re = rng.uniform(-1, 1, (b, n)).astype(np.float32)
    host_im = rng.uniform(-1, 1, (b, n)).astype(np.float32)
    xre = jnp.asarray(host_re)
    xim = jnp.asarray(host_im)
    tre = np.ascontiguousarray(host_re.T)
    tim = np.ascontiguousarray(host_im.T)
    if n <= 2048 and b % 1024 == 0:
        tre = tre.reshape(n, 8, b // 8)
        tim = tim.reshape(n, 8, b // 8)
    xre_t = jnp.asarray(tre)
    xim_t = jnp.asarray(tim)

    # exactly bench.py's headline steps: roundtrip fft+ifft
    def step(c):
        a, bb = c
        a, bb = stockham_fft_nb(a, bb, inverse=False)
        return stockham_fft_nb(a, bb, inverse=True)

    def jstep(c):
        a, bb = c
        z = jnp.fft.ifft(jnp.fft.fft(a + 1j * bb))
        return z.real, z.imag

    for label, s, a in [("ours", step, (xre_t, xim_t)),
                        ("jnp", jstep, (xre, xim))]:
        t = ChainTimer(s, a)
        t.calibrate()
        print(f"[{label}] n={n} b={b} r1={t.r1} r2={t.r2}", flush=True)
        # raw timings, no min-of-2: see the true per-call distribution
        t1s, t2s = [], []
        for _ in range(12):
            t1s.append(t.timed(t.r1))
            t2s.append(t.timed(t.r2))
        t1s_s, t2s_s = sorted(t1s), sorted(t2s)
        print(f"  t(r1) ms: min={t1s_s[0]*1e3:.1f} med={t1s_s[6]*1e3:.1f} "
              f"max={t1s_s[-1]*1e3:.1f} all={['%.0f' % (x*1e3) for x in t1s]}")
        print(f"  t(r2) ms: min={t2s_s[0]*1e3:.1f} med={t2s_s[6]*1e3:.1f} "
              f"max={t2s_s[-1]*1e3:.1f} all={['%.0f' % (x*1e3) for x in t2s]}")
        slope_minmin = (t2s_s[0] - t1s_s[0]) / (t.r2 - t.r1)
        print(f"  slope(min,min) = {slope_minmin*1e6:.2f} us/iter "
              f"-> {2*b/slope_minmin:,.0f} ops/s (roundtrip=2 items)")
        # the harness's current estimator, 6 reps
        sl = [t.slope() for _ in range(6)]
        print(f"  harness slopes us/iter: {['%.2f' % (x*1e6) for x in sl]} "
              f"-> ops/s {['%.3g' % (2*b/x) for x in sl]}")


if __name__ == "__main__":
    main()
