"""CI benchmark sanity check: wins/losses vs the jnp.fft baseline.

Port of scripts/check-benchmarks.js (reference): reports the win/loss table
against the flagship competitor; informational — it never fails CI on a
perf number (check-benchmarks.js:136-138), only on malformed results.

Usage: python scripts/check_benchmarks.py [benchmarks/results/headline.latest.json]
"""

import json
import re
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "benchmarks/results/headline.latest.json"
    try:
        with open(path) as f:
            data = json.load(f)
    except FileNotFoundError:
        print(f"no results at {path} (run python bench.py first)")
        sys.exit(0)

    ours, base = {}, {}
    for r in data["results"]:
        m = re.search(r"n(\d+)$", r["name"])
        if not m:
            continue
        n = int(m.group(1))
        key = ("real" if "real" in r["name"] or "rfft" in r["name"] else "cplx", n)
        if r["name"].startswith("watfft/"):
            ours[key] = r["ops_per_sec"]
        elif r["name"].startswith("jnp.fft/"):
            base[key] = r["ops_per_sec"]

    wins = losses = 0
    for key in sorted(set(ours) & set(base)):
        sp = ours[key] / base[key]
        tag = "WIN " if sp > 1.02 else ("LOSS" if sp < 0.98 else "TIE ")
        if sp > 1.02:
            wins += 1
        elif sp < 0.98:
            losses += 1
        print(f"{tag} {key[0]} n={key[1]:<6} x{sp:.2f}")
    print(f"\n{wins} wins, {losses} losses vs jnp.fft "
          f"(git {data.get('git', {}).get('commit', '?')}, "
          f"{data.get('device', {}).get('device', '?')})")
    # informational only — malformed file would have thrown above
    sys.exit(0)


if __name__ == "__main__":
    main()
