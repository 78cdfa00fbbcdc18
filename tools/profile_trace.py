"""Capture a jax.profiler trace of a kernel invocation.

The tracing/profiling subsystem analog (SURVEY.md §5: the reference's
profiling is workflow-level — V8 --prof + flamegraphs; ours is
jax.profiler + this helper). Open the output dir with TensorBoard or
xprof to see per-kernel device timelines.

Usage:
  python tools/profile_trace.py [n] [batch] [--out /tmp/watfft-trace]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1024
    b = int(args[1]) if len(args) > 1 else 2048
    out = "/tmp/watfft-trace"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    import jax
    import jax.numpy as jnp
    from watfft_tpu.ops.pallas_stockham import stockham_fft_nb

    rng = np.random.default_rng(0)
    xre = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))
    xim = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32))

    @jax.jit
    def chain(a, bb):
        return jax.lax.fori_loop(
            0, 16, lambda i, c: stockham_fft_nb(*c, inverse=(False)), (a, bb))

    # warm (compile outside the trace)
    jax.block_until_ready(chain(xre, xim))

    with jax.profiler.trace(out):
        out_arrs = chain(xre, xim)
        _ = np.asarray(jax.tree.leaves(out_arrs)[0][:1, :1])

    print(f"trace written to {out} — view with: tensorboard --logdir {out}")


if __name__ == "__main__":
    main()
