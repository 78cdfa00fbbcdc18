#!/usr/bin/env python
"""On-chip PAIRED probe of radix-plan candidates at n=512 (round-4).

The round-4 HBM audit found stockham n=512 runs at 352 GB/s effective vs
1118 at n=256 and 834 at n=2048. Cause candidate: Exp 39's radix-32/64
overrides covered 32/1024/2048/4096/8192 but SKIPPED 512, leaving it the
only size below 2048 with a THREE-stage plan ((16,1),(2,16),(16,32)) —
one extra full interleave pass. 512 factors cleanly two-stage as 32*16,
16*32, 8*64 or 64*8. CLAUDE.md trap #3: re-probe measured decision-table
boundaries when adjacent machinery changes.

Usage: python tools/probe_plans512.py [--reps 7]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tools.probe_plans3 import check, paired


def main():
    reps = 7
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    print(f"platform={jax.devices()[0].platform}", flush=True)
    cur = ((16, 1), (2, 16), (16, 32))
    cands = [
        ((32, 1), (16, 32)),
        ((16, 1), (32, 16)),
        ((8, 1), (64, 8)),
        ((64, 1), (8, 64)),
    ]
    for cand in cands:
        err = check(512, cand, True)
        tc, td, r = paired(512, cur, cand, True, reps)
        print(f"  n=512 3D cand={cand}  err={err:.2e}  "
              f"cur={tc*1e6:7.1f}us cand={td*1e6:7.1f}us  "
              f"ratio(cur/cand)={r:.3f}x", flush=True)


if __name__ == "__main__":
    main()
