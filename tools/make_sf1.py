#!/usr/bin/env python3
"""Derive a 10x (~sf1) scale replica of the driver's sf0.1 testdata.

The driver only ships sf{0.001,0.01,0.1}; the sf1 scale spot-check
(BENCH_r09_sf1.json) needs a 10x dataset. This replicates each sf0.1
table 10 times with disjoint key offsets (joins stay key-correct, fan-out
per key unchanged: each replica is a self-contained copy of the star
schema), preserving the exact parquet physical types (nanosecond
timestamps, float arrays) by going through pyarrow, NOT re-inferring
schemas. region/nation stay as-is (fixed dimensions, like TPC-H).

Output: /tmp/sf1/{table}.parquet  (never touches /root/testdata)
"""
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import os
import sys

SRC = "/root/testdata/sf0.1"
# optional overrides: make_sf1.py [replicas] [dst] - e.g. "30 /tmp/sf3"
# for the sf3-scale probe of the heaviest rows
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
OFF = 100_000_000  # even, > any base key: parities and joins preserved

# table -> columns that get the +i*OFF offset
OFFSETS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    os.makedirs(DST, exist_ok=True)
    for table, keys in OFFSETS.items():
        base = pq.read_table(f"{SRC}/{table}.parquet")
        if not keys:  # fixed dimension: single copy
            pq.write_table(base, f"{DST}/{table}.parquet")
            print(f"{table}: {base.num_rows} rows (copied)")
            continue
        parts = []
        for i in range(REPLICAS):
            t = base
            if i > 0:
                for k in keys:
                    idx = t.schema.get_field_index(k)
                    col = pc.add(t.column(k), i * OFF)
                    t = t.set_column(idx, t.schema.field(idx), col)
            parts.append(t)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{table}.parquet")
        print(f"{table}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
