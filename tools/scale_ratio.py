#!/usr/bin/env python3
"""Scale-ratio table: per-query runtime ratio of a scale-replica bench run
against the sf0.1 clean run, flagged against the data-size ratio.

Usage: python3 tools/scale_ratio.py SF_JSON REF_SF01_JSON FACTOR [OUT_MD]

A row scaling at or below FACTOR (the data ratio) is healthy (sub-linear
rows are the shuffle/partition design working); rows above FACTOR need
attribution before they ship. Rows missing on either side are listed.
"""
import json
import sys


def main():
    sf_path, ref_path, factor = sys.argv[1], sys.argv[2], float(sys.argv[3])
    out_path = sys.argv[4] if len(sys.argv) > 4 else None
    sf = json.load(open(sf_path))
    ref = json.load(open(ref_path))
    sfq, refq = sf.get("queries", {}), ref.get("queries", {})

    rows = []
    for k in sorted(sfq):
        if k in refq and refq[k] > 0:
            rows.append((sfq[k] / refq[k], k, refq[k], sfq[k]))
    rows.sort(reverse=True)

    over = [r for r in rows if r[0] > factor]
    sub = [r for r in rows if r[0] <= 1.0]
    lines = [
        f"## Scale ratios: {sf_path} vs {ref_path} (data ratio {factor:g}x)",
        "",
        f"{len(rows)} compared rows - {len(over)} above the {factor:g}x data "
        f"ratio, {len(sub)} at-or-below 1x (flat or better), "
        f"{len(rows) - len(over)} within the envelope.",
        "",
        "| query | sf0.1 s | scaled s | ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    for ratio, k, a, b in rows:
        verdict = ("**OVER**" if ratio > factor
                   else "flat" if ratio <= 1.0
                   else "sub-linear" if ratio <= factor / 2
                   else "ok")
        lines.append(f"| {k} | {a:.2f} | {b:.2f} | {ratio:.1f}x | {verdict} |")
    missing = sorted(set(refq) - set(sfq))
    if missing and len(missing) < 40:
        lines += ["", f"Rows not in the scaled run: {', '.join(missing)}"]
    text = "\n".join(lines) + "\n"
    if out_path:
        open(out_path, "w").write(text)
    print(text)


if __name__ == "__main__":
    main()
