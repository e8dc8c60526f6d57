#!/usr/bin/env python3
"""Splice re-measured rows into a bench JSON, recomputing EVERY aggregate.

Round-12 lesson (verdict item #5): hand-splicing remeasured rows left
`value_fast_tier` (410.45) > `value` (347.92) in BENCH_r12_sf1.json
because the tier total wasn't recomputed. This tool is the only
sanctioned way to merge remeasured rows: it rewrites the row, records
provenance in `remeasured_rows`, and recomputes `value`,
`value_fast_tier` and `value_oracle_tier` from the FINAL queries map so
the output is internally consistent by construction.

Usage:
  bench_splice.py BASE.json OUT.json q_name=seconds [q_name=seconds ...]
  bench_splice.py BASE.json OUT.json --from PARTIAL.json [q1 q2 ...]

The --from form takes rows from another bench JSON (e.g. a min-of-5
re-measure run); with no explicit names it takes every row PARTIAL has.
"""
import json
import sys


def main():
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    base_p, out_p = sys.argv[1], sys.argv[2]
    with open(base_p) as f:
        doc = json.load(f)
    queries = dict(doc.get("queries", {}))
    tiers = doc.get("tier", {})
    prov = dict(doc.get("remeasured_rows", {}))

    updates = {}
    rest = sys.argv[3:]
    if rest and rest[0] == "--from":
        with open(rest[1]) as f:
            part = json.load(f)
        names = rest[2:] or list(part.get("queries", {}).keys())
        for n in names:
            if n not in part.get("queries", {}):
                sys.exit(f"row {n} not in {rest[1]}")
            updates[n] = float(part["queries"][n])
    else:
        for spec in rest:
            name, _, val = spec.partition("=")
            if not val:
                sys.exit(f"bad spec {spec!r} (want q_name=seconds)")
            updates[name] = float(val)

    for name, val in updates.items():
        if name not in queries:
            sys.exit(f"row {name} not in {base_p}")
        prov[name] = {"was": queries[name], "now": val}
        queries[name] = val

    doc["queries"] = queries
    doc["remeasured_rows"] = prov
    # recompute every aggregate from the FINAL map — never trust the old
    total = sum(queries.values())
    doc["value"] = total
    if tiers:
        fast = sum(v for k, v in queries.items() if tiers.get(k) != "oracle")
        doc["value_fast_tier"] = fast
        doc["value_oracle_tier"] = total - fast
    with open(out_p, "w") as f:
        json.dump(doc, f)
    print(f"spliced {len(updates)} rows; value={total:.2f}"
          + (f" fast={doc['value_fast_tier']:.2f}" if tiers else ""))


if __name__ == "__main__":
    main()
