#!/usr/bin/env python3
"""Compare two interleaved A/B bench arms (round-8 method).

Usage: ab_compare.py <prefix> [runsPerArm]
Reads <prefix>_{a,b}_<i>.json, takes per-query MIN over each arm's runs,
prints arm totals, common-row totals, median per-row ratio, and the rows
whose min-of-N ratio exceeds 1.5x (and 1 s) either way.
"""
import json
import statistics
import sys

prefix = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def arm(tag):
    runs = []
    for i in range(1, n + 1):
        try:
            with open(f"{prefix}_{tag}_{i}.json") as f:
                runs.append(json.load(f))
        except FileNotFoundError:
            pass
    if not runs:
        sys.exit(f"no runs for arm {tag}")
    mins = {}
    for r in runs:
        for q, t in r["queries"].items():
            mins[q] = min(mins.get(q, float("inf")), t)
    return mins, [r["value"] for r in runs]


a, a_totals = arm("a")
b, b_totals = arm("b")
common = sorted(set(a) & set(b))
a_sum = sum(a[q] for q in common)
b_sum = sum(b[q] for q in common)
ratios = [b[q] / a[q] for q in common if a[q] > 0]
print(f"arm A run totals: {', '.join(f'{t:.1f}' for t in a_totals)} s"
      f" -> min-combined {sum(a.values()):.1f} s / {len(a)} rows")
print(f"arm B run totals: {', '.join(f'{t:.1f}' for t in b_totals)} s"
      f" -> min-combined {sum(b.values()):.1f} s / {len(b)} rows")
print(f"common rows: {len(common)}  A {a_sum:.1f} s  B {b_sum:.1f} s"
      f"  ratio B/A {b_sum / a_sum:.3f}")
print(f"median per-row ratio B/A: {statistics.median(ratios):.3f}")
flagged = [(q, a[q], b[q], b[q] / a[q]) for q in common
           if a[q] > 0 and max(a[q], b[q]) > 1.0
           and (b[q] / a[q] > 1.5 or b[q] / a[q] < 1 / 1.5)]
flagged.sort(key=lambda x: -abs(x[3] - 1))
print(f"rows >1.5x either way (and >1 s): {len(flagged)}")
for q, av, bv, r in flagged[:20]:
    print(f"  {q}: A {av:.2f} s -> B {bv:.2f} s  ({r:.2f}x)")
