#!/usr/bin/env python3
"""Dev-only sf1 generator: 10 key-shifted copies of the driver's sf0.1
parquet (shift = i * 10_000_000 on every entity key, referential
integrity preserved copy-locally; dims region/nation copied as-is).
Embeddings of copies i >= 1 are DECORRELATED from their source: a
per-copy circular coordinate rotation (preserves the coordinate
distribution and the exact norm, but makes the copy geometrically
independent of the original — cosine ~ random) plus a small
per-(vec_id, dim, copy) perturbation. Exact 10-cliques of identical
vectors made every LSH band bucket degenerate (the r13 s05 rehearsal
measured the adversarial guard, not natural scaling), and a tiny
perturbation ALONE is worse (near-copies still share buckets but
lose the exact-dedup collapse — measured 333 s vs the exact-copy
182.8 s); the rotated corpus scales like independent data.

TEXT payloads of copies i >= 1 get the same treatment (the r15
verdict's top task: exact text copies made every cross-copy shingle
df 10x, so d09's boilerplate guard excluded everything and the sf1
text rehearsals were vacuous). Perturbation is CONTENT-KEYED, not
doc-keyed: each token's substitute/swap decision hashes its trigram
context plus the copy index, so an identical passage appearing in
two documents of the SAME copy transforms identically — natural
containment / near-dup pairs inside a copy survive verbatim — while
the same passage in DIFFERENT copies decorrelates (shingle overlap
across copies ~ chance). Substitution targets are drawn from the
empirical unigram distribution, and token COUNT per document is
preserved exactly, so the unigram/df DISTRIBUTIONS scale like 10x
independent data rather than 10x'ing every df. n_chars is recomputed
(= len(text), the source invariant). Used for the one-decade scale
rehearsal in BASELINE.md; never a library dependency."""
import duckdb, os, sys, zlib
import pyarrow as pa
import pyarrow.parquet as pq

# Content-keyed text perturbation rates (percent). SUB breaks a word
# 3-gram with p ~ 1-(1-.22)^3 = .53; SWAP adds boundary breakage; the
# measured cross-copy 3-gram survival ~ 0.2, so a source shingle with
# df = d has expected sf1 df ~ d*(1+9*0.2) = 2.8d — rare shingles
# (df in [2,20]) keep a healthy population instead of jumping to 10d.
SUB_PCT = 22
SWAP_PCT = 18


def _h(*parts):
    return zlib.crc32("|".join(str(p) for p in parts).encode())


def perturb_text(tokens, copy_i, corpus_toks):
    """Deterministic, content-keyed token perturbation for one copy.
    Same (prev, tok, next, copy) context -> same outcome everywhere,
    so shared passages within a copy stay shared."""
    n = len(tokens)
    out = list(tokens)
    for j in range(n):
        prev = tokens[j - 1] if j > 0 else "^"
        nxt = tokens[j + 1] if j < n - 1 else "$"
        h = _h("U", prev, tokens[j], nxt, copy_i)
        if h % 100 < SUB_PCT:
            base = corpus_toks[(h >> 7) % len(corpus_toks)]
            # Half the substitutions mint a COPY-LOCAL novel token
            # (base + copy letter + hashed letter): the source vocab
            # is 31 tokens, so the 3-gram type space (29,791) is
            # already saturated at sf0.1 (27k types used) and any
            # same-vocab perturbation just multiplies every df by
            # ~10. Real 10x corpora grow vocabulary (Heaps' law);
            # novel tokens make ~30% of each copy's grams copy-local,
            # and because they're content-keyed their df inherits the
            # natural df of the source context instead of collapsing
            # to 1 or exploding to 10x.
            if (h >> 3) % 2:
                out[j] = base + chr(97 + copy_i) + chr(97 + (h >> 12) % 26)
            else:
                out[j] = base
    j = 0
    while j < n - 1:
        if _h("S", out[j], out[j + 1], copy_i) % 100 < SWAP_PCT:
            out[j], out[j + 1] = out[j + 1], out[j]
            j += 2
        else:
            j += 1
    return " ".join(out)

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
def gen_documents():
    src = pq.read_table(f"{SRC}/documents.parquet")
    docs = src.to_pylist()
    # empirical unigram pool: substitution targets sampled from it
    # preserve the corpus token distribution in expectation
    corpus_toks = [tok for r in docs for tok in r["text"].split(" ")]
    out = []
    for i in range(COPIES):
        for r in docs:
            text = r["text"] if i == 0 else \
                perturb_text(r["text"].split(" "), i, corpus_toks)
            out.append({"doc_id": r["doc_id"] + i * SHIFT, "text": text,
                        "lang": r["lang"], "source": r["source"],
                        "n_chars": len(text)})
    pq.write_table(pa.Table.from_pylist(out, schema=src.schema),
                   f"{DST}/documents.parquet")


for t, keys in SHIFTS.items():
    if t == "documents":
        gen_documents()
    else:
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
