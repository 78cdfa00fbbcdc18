"""Per-stage dataflow visualizer for the mixed-radix Stockham plan.

Analog of tools/index_visualizer.js (reference: dumps exactly which indices
each stage reads and writes so a stage-coordination bug — output of stage i
not matching the input pattern stage i+1 expects — is a 10-minute find
instead of a day, tools/index_visualizer.js:1-110). TPU re-axing: the
reference visualizes scalar butterfly indices inside one transform; here a
"row" is an entire [batch]-wide VPU lane vector (the kernel's unit of data
movement), so the patterns shown ARE the slices/interleaves the Pallas
kernel performs, for both the 2D [n, b] and native 3D [n, 8, w] layouts
(identical row algebra — rank only changes the minor dims, _interleave3).

For every stage (R, l) of stage_plan(n) this prints, per output-row group:
    read rows   p*q + j*l + k          (q = n/R; contiguous part blocks)
    twiddle     w_{R*l}^{p*k}          (packed col offset, -1 if l == 1)
    write rows  j*R*l + p*l + k        (the Stockham autosort interleave)
and cross-checks three invariants mechanically (also used by CI):
  1. every stage's write pattern is a permutation of 0..n-1,
  2. stage i+1's contiguous part reads cover stage i's writes exactly,
  3. the composed data movement is itself a permutation (no row lost or
     duplicated across the chain; the VALUE-level natural-order proof —
     movement + arithmetic together — is permutation_validator.py's job).

Usage:
    python tools/index_visualizer.py [n ...] [--rows K] [--quiet]
    (default sizes: 64 2048; --rows caps printed rows per stage; --quiet
    prints only the invariant verdicts — the CI mode)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from watfft_tpu.ops.pallas_stockham import make_twiddle_pack, stage_plan


def stage_patterns(n: int) -> list[dict]:
    """The full read/twiddle/write index table for every stage of n's plan.

    Returns one dict per stage: {r, l, q, g, tw_offset, rows: [(read_rows,
    tw_cols, write_rows), ...]} where each entry is one butterfly group —
    the R input rows that combine, the R-1 packed twiddle column rows they
    are scaled by (p=1..R-1; None when l == 1), and the R output rows the
    small-DFT results land on.
    """
    offsets = make_twiddle_pack(n, False)[2]
    stages = []
    for idx, (r, l) in enumerate(stage_plan(n)):
        q = n // r
        g = n // (r * l)
        rows = []
        for j in range(g):
            for k in range(l):
                read = [p * q + j * l + k for p in range(r)]
                write = [j * r * l + p * l + k for p in range(r)]
                tw = None
                if offsets[idx] >= 0:
                    # packed twiddle rows for p=1..R-1: block p-1 starts at
                    # offset + (p-1)*q, indexed by the row's (j*l+k) position
                    tw = [offsets[idx] + (p - 1) * q + j * l + k
                          for p in range(1, r)]
                rows.append((read, tw, write))
        stages.append({"r": r, "l": l, "q": q, "g": g,
                       "tw_offset": offsets[idx], "rows": rows})
    return stages


def check_invariants(n: int, stages: list[dict]) -> list[str]:
    """Mechanical checks over the pattern table; returns failure strings."""
    fails = []
    # track where each ORIGINAL row currently lives: pos[v] = current row of
    # the value that started at row v
    perm = np.arange(n)
    for i, st in enumerate(stages):
        writes = np.full(n, -1)
        for read, _, write in st["rows"]:
            for rr, wr in zip(read, write):
                if writes[wr] != -1:
                    fails.append(f"n={n} stage {i}: row {wr} written twice")
                writes[wr] = rr
        if (writes < 0).any():
            fails.append(f"n={n} stage {i}: "
                         f"{int((writes < 0).sum())} rows never written")
            continue
        # stage reads must be the contiguous part blocks of the previous
        # stage's output (the kernel slices [p*q:(p+1)*q] directly)
        reads = sorted(r for read, _, _ in st["rows"] for r in read)
        if reads != list(range(n)):
            fails.append(f"n={n} stage {i}: reads are not a cover of 0..n-1")
        perm = perm[writes]
    # Stockham autosort: value starting at row v must end at row v after the
    # arithmetic's digit reordering — equivalently the composed data-movement
    # equals the plan's digit-reversal, which run_stages' twiddles undo to
    # natural order. The executable ground truth: feeding row indices through
    # the real kernel path (permutation_validator.py) — here we assert the
    # composition is a permutation (movement conserves rows).
    if sorted(perm.tolist()) != list(range(n)):
        fails.append(f"n={n}: composed chain is not a permutation")
    return fails


def visualize(n: int, max_rows: int = 8, quiet: bool = False) -> bool:
    stages = stage_patterns(n)
    plan = [(s["r"], s["l"]) for s in stages]
    if not quiet:
        print(f"\nn={n}  plan={plan}  "
              f"(layout: 2D [n,b] / native 3D [n,8,w] — same row algebra)")
    for i, st in enumerate(stages):
        if not quiet:
            tw = ("twiddle-free (l=1)" if st["tw_offset"] < 0 else
                  f"twiddle pack rows {st['tw_offset']}..."
                  f"{st['tw_offset'] + (st['r'] - 1) * st['q'] - 1}")
            print(f"  stage {i}: R={st['r']:<3} l={st['l']:<5} q={st['q']:<5}"
                  f" groups={st['g'] * st['l']:<6} {tw}")
            for read, twc, write in st["rows"][:max_rows]:
                twtxt = "" if twc is None else f"  tw={twc}"
                print(f"    read {read} -> write {write}{twtxt}")
            if len(st["rows"]) > max_rows:
                print(f"    ... {len(st['rows']) - max_rows} more groups")
    fails = check_invariants(n, stages)
    for f in fails:
        print(f"  FAIL: {f}")
    if not fails:
        print(f"n={n}: OK — {len(stages)} stages, every write unique, reads "
              f"cover writes, composed chain is a permutation")
    return not fails


def main() -> int:
    args = [a for a in sys.argv[1:]]
    quiet = "--quiet" in args
    max_rows = 8
    if "--rows" in args:
        max_rows = int(args[args.index("--rows") + 1])
        del args[args.index("--rows"):args.index("--rows") + 2]
    sizes = [int(a) for a in args if not a.startswith("--")] or [64, 2048]
    ok = True
    for n in sizes:
        ok &= visualize(n, max_rows=max_rows, quiet=quiet)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
