#!/usr/bin/env python3
"""Dev-only sf1 generator: 10 key-shifted copies of the driver's sf0.1
parquet (shift = i * 10_000_000 on every entity key, referential
integrity preserved copy-locally; dims region/nation copied as-is;
text payloads unchanged — cross-copy duplicates are realistic dedup
input). Embeddings of copies i >= 1 are DECORRELATED from their
source: a per-copy circular coordinate rotation (preserves the
coordinate distribution and the exact norm, but makes the copy
geometrically independent of the original — cosine ~ random) plus a
small per-(vec_id, dim, copy) perturbation. Exact 10-cliques of
identical vectors made every LSH band bucket degenerate (the r13
s05 rehearsal measured the adversarial guard, not natural scaling),
and a tiny perturbation ALONE is worse (near-copies still share
buckets but lose the exact-dedup collapse — measured 333 s vs the
exact-copy 182.8 s); the rotated corpus scales like independent
data. Used for the one-decade scale rehearsal in BASELINE.md; never
a library dependency."""
import duckdb, os, sys
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.sf1data/sf1"
SHIFT = 10_000_000
COPIES = 10

SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

os.makedirs(DST, exist_ok=True)
c = duckdb.connect()
for t in ["region", "nation"]:
    c.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
for t, keys in SHIFTS.items():
    parts = []
    for i in range(COPIES):
        rep = ", ".join(f"{k} + {i * SHIFT} AS {k}" for k in keys)
        if t == "embeddings" and i > 0:
            rot = (i * 7) % 64
            rotated = (f"list_concat(embedding[{rot + 1}:64], "
                       f"embedding[1:{rot}])")
            rep += (f", list_transform(range(1, len(embedding)+1), j -> "
                    f"CAST(({rotated})[j] + ((vec_id * 31 + j * 7 + {i} * 13)"
                    " % 17 - 8) * 0.0015 AS FLOAT)) AS embedding")
        parts.append(f"SELECT * REPLACE ({rep}) FROM '{SRC}/{t}.parquet'")
    c.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    # schema must match the source exactly (the engine's Tables
    # contract) — compare pyarrow types field by field
    a = pq.read_schema(f"{SRC}/{t}.parquet")
    b = pq.read_schema(f"{DST}/{t}.parquet")
    assert [(f.name, f.type) for f in a] == [(f.name, f.type) for f in b], \
        f"{t}: schema drift\n{a}\nvs\n{b}"
    na = pq.read_metadata(f"{SRC}/{t}.parquet").num_rows
    nb = pq.read_metadata(f"{DST}/{t}.parquet").num_rows
    assert nb == COPIES * na, (t, na, nb)
    print(t, na, "->", nb)
print("sf1 generated at", DST)
