#!/usr/bin/env python3
"""Emit BENCH_delta.md: per-query comparison of a fresh clean-commit bench
run against the previous round's reference numbers.

Usage: python3 tools/bench_delta.py NEW_BENCH_JSON OUT_MD [REF_JSON]

Reference numbers come from BENCH_r06_clean.json — the round-6 full
clean-commit run (232 queries, 176.6 s, judge-verified in VERDICT.md).
Rows with ratio > 1.5x are flagged. Pass REF_JSON to compare against a
different reference run.
"""
import json
import sys


def main():
    new_path, out_path = sys.argv[1], sys.argv[2]
    ref_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_r06_clean.json"
    new = json.load(open(new_path))
    ref = json.load(open(ref_path))
    newq = new.get("queries", {})
    refq = ref.get("queries", {})

    tier = new.get("tier", {})
    lines = [
        "# BENCH_delta — new clean run vs reference run",
        "",
        f"New clean-commit run: **{new.get('value', 0.0):.1f} s total, "
        f"{len(newq)} queries** (sf {new.get('sf', '?')}"
        + (f", per-query best-of-{new['reps']} after {new.get('warmup', 0)} warm-up"
           if new.get("reps", 1) > 1 else "")
        + ").",
        f"Reference ({ref_path}): {ref.get('value', 0.0):.1f} s total, "
        f"{len(refq)} queries"
        + (f", best-of-{ref['reps']}" if ref.get("reps", 1) > 1
           else ", single-shot (noisier)") + ".",
    ]
    if "value_fast_tier" in new:
        lines.append(
            f"Tier split: fast **{new['value_fast_tier']:.1f} s** / "
            f"oracle-fixture {new['value_oracle_tier']:.1f} s "
            f"({sum(1 for q in newq if tier.get(q) == 'oracle')} deliberate-slow "
            "DECIMAL-exact oracle rows).")
    lines += [
        "",
        "| query | new (s) | ref (s) | ratio | flag |",
        "|---|---|---|---|---|",
    ]
    flags = []
    for name in sorted(newq, key=lambda n: -newq[n]):
        t5 = newq[name]
        label = f"{name} *(oracle)*" if tier.get(name) == "oracle" else name
        if name in refq:
            r4 = refq[name]
            ratio = t5 / r4 if r4 > 0 else float("inf")
            # flag only rows where the absolute cost matters: a 0.1->0.2s
            # jump is noise, a 2->4s jump is a regression
            flag = "**>1.5x**" if (ratio > 1.5 and t5 > 1.0) else ""
            if flag:
                flags.append((name, t5, r4, ratio))
            lines.append(f"| {label} | {t5:.2f} | {r4:.2f} | {ratio:.2f} | {flag} |")
        else:
            lines.append(f"| {label} | {t5:.2f} | - | new | |")
    lines.append("")
    if flags:
        lines.append("## Flagged (>1.5x and >1 s vs reference run)")
        for name, t5, r4, ratio in flags:
            lines.append(f"- `{name}`: {r4:.2f} -> {t5:.2f} s ({ratio:.1f}x)")
    else:
        lines.append("No query regressed >1.5x (above 1 s) against the "
                     "reference run.")
    open(out_path, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out_path}: {len(newq)} rows, {len(flags)} flagged")


if __name__ == "__main__":
    main()
