#!/usr/bin/env python
"""Round-4 re-probe of the radix-plan decision table with the FIXED timer.

Exp 45 found ChainTimer's pilot slope ate the r2 compile, so every plan
decision made before the fix (Exp 39's _PLAN_OVERRIDES, round-3 session)
was measured with chains that never lengthened — paired medians soften
but do not remove that distortion (the n=512 re-probe in Exp 46 flipped
a boundary). CLAUDE.md trap #3: re-probe measured decision-table
boundaries when adjacent machinery changes. This probe (a) re-confirms
the landed winners, (b) tries two-stage ORDERING variants on the 3D
layout that were never measured (Exp 46 showed ordering is worth ~13%
at 512: (16,32) beat (32,16)).

Usage: python tools/probe_plans4.py [--reps 5] [--group a|b|c]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tools.probe_plans3 import check, paired
from watfft_tpu.ops.pallas_stockham import stage_plan


def cur_plan(n, three_d):
    return tuple(stage_plan(n, three_d))


# (label, n, three_d, candidate plan as (R, l) stages)
CASES = {
    # group a: 3D ordering variants never measured
    "a": [
        ("1024-3d 32*32", 1024, True, ((32, 1), (32, 32))),
        ("1024-3d 16*64", 1024, True, ((16, 1), (64, 16))),
        ("2048-3d 32*64 order", 2048, True, ((32, 1), (64, 32))),
    ],
    # group b: re-confirm Exp 39 landed winners vs the old defaults
    "b": [
        ("1024-3d old default", 1024, True, ((16, 1), (4, 16), (16, 64))),
        ("2048-3d old default", 2048, True, ((8, 1), (16, 8), (16, 128))),
        ("4096-2d old default", 4096, False, ((16, 1), (16, 16), (16, 256))),
    ],
    # group c: 8192 three-stage orderings + 256/128 3D re-probe
    "c": [
        ("8192-2d 64*16*8", 8192, False, ((64, 1), (16, 64), (8, 1024))),
        ("8192-2d 16*32*16", 8192, False, ((16, 1), (32, 16), (16, 512))),
        ("256-3d 32*8", 256, True, ((32, 1), (8, 32))),
        ("128-3d 16*8", 128, True, ((16, 1), (8, 16))),
    ],
}


def main():
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    groups = ["a", "b", "c"]
    if "--group" in sys.argv:
        groups = [sys.argv[sys.argv.index("--group") + 1]]
    print(f"platform={jax.devices()[0].platform}", flush=True)
    for g in groups:
        for label, n, three_d, cand in CASES[g]:
            cur = cur_plan(n, three_d)
            if cand == cur:
                print(f"  {label}: candidate IS current, skip", flush=True)
                continue
            err = check(n, cand, three_d)
            tc, td, r = paired(n, cur, cand, three_d, reps)
            print(f"  {label:<22} cur={tc*1e6:7.1f}us cand={td*1e6:7.1f}us  "
                  f"ratio(cur/cand)={r:.3f}x  err={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
