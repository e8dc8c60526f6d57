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
import hashlib
import random
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import os
import sys

SRC = "/root/testdata/sf0.1"
# optional overrides: make_sf1.py [replicas] [dst] [--perturb[=dup_rate]]
# e.g. "30 /tmp/sf3" for the sf3-scale probe of the heaviest rows.
#
# --perturb de-aliases the dedup scale evidence (round-12 verdict item
# #4): plain replication copies every document byte-identically, so each
# doc has REPLICAS exact copies, every MinHash band bucket is REPLICAS
# deep, and LSH candidate pairs grow ~REPLICAS^2 by construction — an
# artifact that can never be retired by measurement. With --perturb,
# replica i>0 of a doc is with probability dup_rate a NEAR-DUPLICATE
# (~2% token noise — stays inside the minhash similarity threshold) and
# otherwise a DISTINCT document (~35% token replacement — falls well
# outside it), so candidate volume tracks a realistic duplicate rate.
# Deterministic per (doc_id, replica): same inputs -> same corpus.
ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
FLAGS = [a for a in sys.argv[1:] if a.startswith("--")]
REPLICAS = int(ARGS[0]) if len(ARGS) > 0 else 10
DST = ARGS[1] if len(ARGS) > 1 else "/tmp/sf1"
PERTURB = None  # None = byte-identical replicas (legacy behavior)
# --skew[=frac] (round-14 verdict item #4): redirect `frac` (default 0.3)
# of the fact-table foreign keys to ONE hot key — the base corpus's min
# key — so one node/key holds ~frac of all edges/join rows (the
# single-giant-key shape AQE skew-join and the width/endgame logic must
# survive). Deterministic per (table, column, replica); replicated keys
# still point at the BASE hot key, so the hub grows with REPLICAS.
SKEW = None
for f in FLAGS:
    if f == "--perturb":
        PERTURB = 0.1
    elif f.startswith("--perturb="):
        PERTURB = float(f.split("=", 1)[1])
    elif f == "--skew" or f == "--skew=zipf":
        SKEW = 0.3
    elif f.startswith("--skew="):
        SKEW = float(f.split("=", 1)[1])
OFF = 100_000_000  # even, > any base key: parities and joins preserved


def perturb_text(text, doc_id, replica, vocab, dup_rate):
    """Deterministic token-level noise for one replica of one document."""
    seed = int.from_bytes(
        hashlib.sha256(f"{doc_id}:{replica}".encode()).digest()[:8], "big")
    rng = random.Random(seed)
    toks = text.split(" ")
    rate = 0.02 if rng.random() < dup_rate else 0.35
    for j in range(len(toks)):
        if rng.random() < rate:
            toks[j] = vocab[rng.randrange(len(vocab))]
    return " ".join(toks)

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


# fact-table FK columns the --skew mode collapses onto one hot key, and
# the (table, key) the hot value is read from. l_partkey -> one hot Part
# is the CONTAINS-edge hub (WCC/LPA/adjacency); l_orderkey -> one hot
# Order skews the orders-lineitem sort-merge join; o_custkey / user_id
# skew PLACED edges and the event aggregations.
SKEW_COLS = {
    "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                 "l_partkey": ("part", "p_partkey")},
    "orders": {"o_custkey": ("customer", "c_custkey")},
    "events": {"user_id": ("events", "user_id")},
}


def apply_skew(t, table, replica):
    if SKEW is None or table not in SKEW_COLS:
        return t
    import numpy as np
    for k, (ht, hk) in SKEW_COLS[table].items():
        hot = pc.min(pq.read_table(f"{SRC}/{ht}.parquet", columns=[hk])
                     .column(hk)).as_py()
        idx = t.schema.get_field_index(k)
        col = t.column(k).to_numpy(zero_copy_only=False)
        seed = int.from_bytes(
            hashlib.sha256(f"skew:{table}:{k}:{replica}".encode()).digest()[:8],
            "big")
        mask = np.random.default_rng(seed).random(len(col)) < SKEW
        col = np.where(mask, hot, col)
        t = t.set_column(idx, t.schema.field(idx),
                         pa.array(col, type=t.schema.field(idx).type))
    return t


def main():
    os.makedirs(DST, exist_ok=True)
    for table, keys in OFFSETS.items():
        base = pq.read_table(f"{SRC}/{table}.parquet")
        if not keys:  # fixed dimension: single copy
            pq.write_table(base, f"{DST}/{table}.parquet")
            print(f"{table}: {base.num_rows} rows (copied)")
            continue
        vocab = None
        if PERTURB is not None and table == "documents":
            seen = set()
            for txt in base.column("text").to_pylist():
                seen.update(txt.split(" "))
            vocab = sorted(seen)
        parts = []
        for i in range(REPLICAS):
            t = base
            if i > 0:
                for k in keys:
                    idx = t.schema.get_field_index(k)
                    col = pc.add(t.column(k), i * OFF)
                    t = t.set_column(idx, t.schema.field(idx), col)
                if vocab is not None:
                    ids = t.column("doc_id").to_pylist()
                    txts = base.column("text").to_pylist()
                    new = [perturb_text(txt, ids[r], i, vocab, PERTURB)
                           for r, txt in enumerate(txts)]
                    ti = t.schema.get_field_index("text")
                    t = t.set_column(ti, t.schema.field(ti),
                                     pa.array(new, type=pa.string()))
                    ci = t.schema.get_field_index("n_chars")
                    t = t.set_column(ci, t.schema.field(ci),
                                     pa.array([len(x) for x in new],
                                              type=pa.int64()))
            # skew AFTER the offsets so every replica's masked rows point
            # at the BASE hot key (one global hub, not one per replica)
            t = apply_skew(t, table, i)
            parts.append(t)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{table}.parquet")
        print(f"{table}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
