#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <verify_out_dir> [sf_dir] [--only a,b,c]

--only runs just the named queries (comma-separated) — the fast loop
when iterating on one operator, or to skip the O(N^2) truth oracles
at larger SFs.

Reads each <name>/ parquet dumped by graft.Verify plus oracle_sql.json,
runs every oracle SQL in DuckDB against the sf parquet tables, and
compares: column names (sorted), column TYPE CLASSES (sorted by name
— the driver's hash is type-sensitive across classes but not widths:
INTEGER-vs-BIGINT passes the driver gate, while a DuckDB sum()
widening BIGINT to HUGEINT fails it because the pandas fetch turns
HUGEINT into float64 — the round-7 g01/g03 lesson), row counts, and
values (rows sorted, exact after the engine-side rounding). Prints
PASS/FAIL per query.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _p(*a):
    print(*a, flush=True)


def type_class(t):
    """Collapse a DuckDB type name to the equivalence class the
    driver's hash actually distinguishes. Exact-int widths hash the
    same (pandas holds them all as exact ints); HUGEINT is NOT in
    that class — the pandas fetch converts it to float64, which is
    exactly how the round-7 g01/g03 oracle defect slipped past a
    type-blind compare."""
    t = str(t).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    return t  # HUGEINT, DECIMAL(p,s), VARCHAR, DATE, ... stand alone


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and represent with enough digits
        return f"{v + 0.0:.10g}"
    return str(v)


def main():
    args = list(sys.argv[1:])
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    out_dir = Path(args[0])
    sf_dir = Path(args[1] if len(args) > 1 else "/root/testdata/sf0.01")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    if only is not None:
        known = set(oracle) | {d.name for d in out_dir.iterdir() if d.is_dir()}
        unknown = only - known
        if not only or unknown:
            _p(f"ERROR: --only names not found: {sorted(unknown) or '(empty)'}")
            sys.exit(2)
        oracle = {k: v for k, v in oracle.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = out_dir / name
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = got.fetchall()
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = exp.fetchall()
        except Exception as e:
            _p(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            _p(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        gidx = [got.columns.index(c) for c in got_cols]
        eidx = [exp.columns.index(c) for c in exp_cols]
        got_types = [type_class(got.types[i]) for i in gidx]
        exp_types = [type_class(exp.types[i]) for i in eidx]
        if got_types != exp_types:
            bad = [(c, a, b) for c, a, b in
                   zip(got_cols, got_types, exp_types) if a != b]
            _p(f"FAIL {name}: column types differ (spark vs oracle): {bad}")
            n_fail += 1
            continue
        g = sorted(tuple(norm(r[i]) for i in gidx) for r in got_rows)
        e = sorted(tuple(norm(r[i]) for i in eidx) for r in exp_rows)
        if len(g) != len(e):
            _p(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
        elif g != e:
            diffs = [(a, b) for a, b in zip(g, e) if a != b][:3]
            _p(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
        else:
            _p(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    # queries without an oracle: rows>0 check
    for qdir in sorted(out_dir.iterdir()):
        if qdir.is_dir() and qdir.name not in oracle and (
                only is None or qdir.name in only):
            try:
                n = con.sql(f"SELECT count(*) FROM read_parquet('{qdir}/*.parquet')").fetchone()[0]
                status = "PASS" if n > 0 else "FAIL"
                _p(f"{status} {qdir.name} (rows-only: {n} rows)")
                if n > 0:
                    n_pass += 1
                else:
                    n_fail += 1
            except Exception as e:
                _p(f"FAIL {qdir.name}: {e}")
                n_fail += 1
    _p(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
