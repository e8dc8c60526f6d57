#!/usr/bin/env python3
"""Evidence gate: every bench/correctness artifact cited by a committed
markdown doc must actually exist in the repo, and every committed bench
JSON must be internally consistent.

Rounds 11, 12, and 13 each cited a `BENCH_r*_sf3.json` (or left sweep
evidence in /tmp) that was never committed — three consecutive verdicts
flagged the same failure class. This tool makes the gate structural:

  1. Dangling citations: grep every tracked .md for BENCH_*.json /
     CORRECTNESS_*.json tokens; each cited name must exist at repo root.
  2. Tier-total consistency: for every BENCH_*.json,
     value_fast_tier + value_oracle_tier must equal value (tolerance
     1e-6) and neither tier may exceed the total; the tier map must
     cover exactly the queries map.
  3. Stub sections: no tracked BENCH_delta_*.md may contain a
     "(filled below" placeholder.

Exit 0 = gate passes. Non-zero = list of violations on stderr.
Run from the repo root (or pass the root as argv[1]). Wired into the
end-of-round checklist and EvidenceGateSpec.

Retro-check: run against the round-11/12/13 trees this fails on the
dangling BENCH_r11/12/13_sf3.json citations and the r13 stubs, which is
the point.
"""
import json
import os
import re
import subprocess
import sys

CITE_RE = re.compile(r"\b((?:BENCH|CORRECTNESS)_[A-Za-z0-9_]+\.json)\b")
# names that docs may legitimately cite as *future/driver* artifacts:
# the driver writes CORRECTNESS_r{N}.json / BENCH_r{N}.json at round end,
# AFTER the docs describing them are committed.
FUTURE_OK_RE = re.compile(r"^(BENCH|CORRECTNESS)_r\d+\.json$")


def tracked_files(root, suffix):
    out = subprocess.run(
        ["git", "ls-files", "*" + suffix], cwd=root,
        capture_output=True, text=True, check=True).stdout
    return [l for l in out.splitlines() if l]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    errors = []

    # 1. dangling citations — builder docs only: VERDICT.md/ADVICE.md are
    # judge/advisor output and may name hypothetical future artifacts
    # ("commit BENCH_r14_sf10.json"); the gate audits THIS repo's claims.
    for md in tracked_files(root, ".md"):
        if os.path.basename(md) in ("VERDICT.md", "ADVICE.md"):
            continue
        text = open(os.path.join(root, md), encoding="utf-8").read()
        for name in sorted(set(CITE_RE.findall(text))):
            if os.path.exists(os.path.join(root, name)):
                continue
            if FUTURE_OK_RE.match(name):
                continue  # driver-written round artifact
            errors.append(f"{md}: cites {name} which does not exist in the repo")

    # 1b. dangling citations inside committed bench JSONs themselves —
    # round 14's failed-probe artifact cited its successor
    # ("the successful re-probe ... is BENCH_r14_sf10.json") in a "note"
    # field, which the .md-only scan missed.
    for jf in tracked_files(root, ".json"):
        base = os.path.basename(jf)
        if not (base.startswith("BENCH_") or base.startswith("CORRECTNESS_")):
            continue
        text = open(os.path.join(root, jf), encoding="utf-8").read()
        for name in sorted(set(CITE_RE.findall(text))):
            if name == base or os.path.exists(os.path.join(root, name)):
                continue
            if FUTURE_OK_RE.match(name):
                continue
            errors.append(f"{jf}: cites {name} which does not exist in the repo")

    # 2. bench JSON internal consistency
    for name in sorted(os.listdir(root)):
        if not (name.startswith("BENCH_") and name.endswith(".json")):
            continue
        try:
            doc = json.load(open(os.path.join(root, name), encoding="utf-8"))
        except Exception as e:  # noqa: BLE001 - report, don't crash the gate
            errors.append(f"{name}: unparseable JSON ({e})")
            continue
        q = doc.get("queries")
        if not isinstance(q, dict):
            continue  # early-round formats without a queries map
        total = doc.get("value")
        fast = doc.get("value_fast_tier")
        oracle = doc.get("value_oracle_tier")
        if total is not None and fast is not None:
            if fast > total + 1e-6:
                errors.append(f"{name}: value_fast_tier {fast} > value {total}")
            if oracle is not None:
                if oracle > total + 1e-6:
                    errors.append(f"{name}: value_oracle_tier {oracle} > value {total}")
                if abs((fast + oracle) - total) > 1e-6:
                    errors.append(
                        f"{name}: fast {fast} + oracle {oracle} != value {total}")
        tier = doc.get("tier")
        if isinstance(tier, dict) and set(tier) != set(q):
            missing = set(q) - set(tier)
            extra = set(tier) - set(q)
            errors.append(
                f"{name}: tier map does not cover queries map "
                f"(missing {sorted(missing)[:3]}, extra {sorted(extra)[:3]})")

    # 3. stub sections in delta docs
    for md in tracked_files(root, ".md"):
        if "BENCH_delta" not in md:
            continue
        text = open(os.path.join(root, md), encoding="utf-8").read()
        for i, line in enumerate(text.splitlines(), 1):
            if "(filled below" in line:
                errors.append(f"{md}:{i}: unfilled stub: {line.strip()}")

    if errors:
        for e in errors:
            print(f"EVIDENCE GATE: {e}", file=sys.stderr)
        sys.exit(1)
    print(f"evidence gate: OK")


if __name__ == "__main__":
    main()
