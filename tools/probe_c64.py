#!/usr/bin/env python
"""On-chip plan ladder at complex n=64 (round-5 follow-up to Exp 49).

n=64 runs 3.06x vs jnp — above the bar but below its small-n neighbors
(n=16: 5.0x, n=32: 3.7x). Exp 39 found the SINGLE-stage radix-32 plan
won 1.63x at n=32, but n=64 = the maximum supported radix was never
probed as a single stage: the default factoring gives ((16,1),(4,16)) —
two stages, two interleave passes. Ladder (probe_plans3 machinery,
paired chained roundtrips on the native 3D layout [64, 8, 4096]):

  ((64, 1),)          single radix-64 stage (zero interleave passes?)
  ((8, 1), (8, 8))    balanced two-stage
  ((32, 1), (2, 32))  Exp 39's n=32 winner + radix-2 tail
  ((4, 1), (16, 4))   reversed remainder order

Also re-probes n=16 ((16,1) current single stage) against ((4,1),(4,4))
for completeness, and n=32's landed (32,1) against the default two-stage
(regression check of the Exp 39 entry with the fixed ChainTimer).

Usage: python tools/probe_c64.py [--reps 7]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from watfft_tpu.bench.harness import enable_compile_cache
from tools.probe_plans3 import check, paired


def main():
    enable_compile_cache()
    reps = 7
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    print(f"platform={jax.devices()[0].platform}", flush=True)
    cases = [
        (64, ((16, 1), (4, 16)), ((64, 1),)),
        (64, ((16, 1), (4, 16)), ((8, 1), (8, 8))),
        (64, ((16, 1), (4, 16)), ((32, 1), (2, 32))),
        (64, ((16, 1), (4, 16)), ((4, 1), (16, 4))),
        (16, ((16, 1),), ((4, 1), (4, 4))),
        (32, ((32, 1),), ((16, 1), (2, 16))),
    ]
    for n, cur, cand in cases:
        try:
            err = check(n, cand, True)
            tc, td, r = paired(n, cur, cand, True, reps)
            print(f"  n={n:<4} cand={cand}  err={err:.1e}  "
                  f"cur={tc*1e6:6.1f}us cand={td*1e6:6.1f}us  "
                  f"ratio(cur/cand)={r:.3f}x", flush=True)
        except Exception as e:
            print(f"  n={n:<4} cand={cand}  FAILED {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
