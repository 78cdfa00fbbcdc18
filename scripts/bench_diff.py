"""Noise-aware benchmark diff between two saved result files.

Port of scripts/bench-diff.js (reference): a change is significant only if
|delta| > max(2%, 3 * combined CV) (bench-diff.js:33-34, 85-86) — protects
against declaring regressions out of run-to-run noise.

Usage: python scripts/bench_diff.py OLD.json NEW.json
"""

import json
import math
import sys


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    with open(sys.argv[1]) as f:
        old = {r["name"]: r for r in json.load(f)["results"]}
    with open(sys.argv[2]) as f:
        new = {r["name"]: r for r in json.load(f)["results"]}

    regressions = 0
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if o["ops_per_sec"] <= 0:
            continue
        delta = (n["ops_per_sec"] - o["ops_per_sec"]) / o["ops_per_sec"]
        threshold = max(0.02, 3.0 * math.hypot(o.get("cv", 0), n.get("cv", 0)))
        if abs(delta) > threshold:
            tag = "REGRESSION" if delta < 0 else "improvement"
            print(f"{name}: {delta:+.1%} ({tag}; threshold {threshold:.1%})")
            if delta < 0:
                regressions += 1
        else:
            print(f"{name}: {delta:+.1%} (within noise)")
    only_old = set(old) - set(new)
    only_new = set(new) - set(old)
    for n_ in sorted(only_old):
        print(f"{n_}: removed")
    for n_ in sorted(only_new):
        print(f"{n_}: new")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
