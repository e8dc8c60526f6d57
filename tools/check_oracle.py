#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB over the raw tables, sort columns by
name, sort rows, and compare cell-by-cell (exact for non-floats; exact-bits
for floats, with a report of max abs diff when not exact).
"""
import json
import math
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify lists for sortability
    for c in df.columns:
        if df[c].apply(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, str)).any():
            df[c] = df[c].apply(lambda v: json.dumps(list(v)) if v is not None and not (isinstance(v, float) and math.isnan(v)) else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.execute(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_fail += 1
                continue
            ok = True
            for c in g.columns:
                a, b = g[c], w[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    aa = a.astype(float)
                    bb = b.astype(float)
                    exact = ((aa == bb) | (aa.isna() & bb.isna())).all()
                    if not exact:
                        mad = (aa - bb).abs().max()
                        print(f"FAIL {name}: float col {c} max abs diff {mad}")
                        ok = False
                else:
                    eq = (a.astype(str).fillna("\0") == b.astype(str).fillna("\0")).all()
                    if not eq:
                        bad = (a.astype(str) != b.astype(str))
                        i = bad[bad].index[0]
                        print(f"FAIL {name}: col {c} row {i}: {a[i]!r} != {b[i]!r}")
                        ok = False
            if ok:
                n_pass += 1
                print(f"PASS {name} ({len(g)} rows)")
            else:
                n_fail += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
