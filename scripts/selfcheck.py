#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <verify_out_dir> [sf_dir] [--only a,b,c]

--only runs just the named queries (comma-separated) — the fast loop
when iterating on one operator, or to skip the O(N^2) truth oracles
at larger SFs.

Reads each <name>/ parquet dumped by graft.Verify plus oracle_sql.json,
runs every oracle SQL in DuckDB against the sf parquet tables, and
compares: column names (sorted), column TYPE CLASSES (sorted by name),
row counts, and values (rows sorted, exact after the engine-side
rounding). Prints PASS/FAIL per query.

MIRRORS THE DRIVER'S ASYMMETRIC FETCH (the round-11 lesson): the
driver reads the ENGINE parquet through pyarrow (decimal128 ->
decimal.Decimal, exact) but the ORACLE through a pandas fetch
(DECIMAL/HUGEINT -> float64) — so a DECIMAL(38,0) report column
hash-fails the driver even when every value is numerically identical
(q59/q60, round 11), exactly as HUGEINT did in round 7 (g01/g03).
This script therefore (a) reads the engine side via pyarrow, NOT
DuckDB — reading it through DuckDB collapses both sides to one
representation and is blind to the whole failure class — and
(b) hard-FAILS any DECIMAL or HUGEINT report column on either side:
those types cannot hash consistently across the driver's two fetch
paths, so they must never appear in a report schema (render as an
exactly-rounded DOUBLE or a VARCHAR digit string instead).
"""
import datetime as dt
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Types the driver's two fetch paths represent differently — exact on
# the pyarrow side, float64 on the pandas side. Never in a report.
FORBIDDEN = ("DECIMAL", "HUGEINT")


def _p(*a):
    print(*a, flush=True)


def type_class(t):
    """Collapse a DuckDB type name to the equivalence class the
    driver's hash actually distinguishes. Exact-int widths hash the
    same (pandas holds them all as exact ints); HUGEINT and DECIMAL
    are NOT in that class — the pandas oracle fetch converts them to
    float64 while the pyarrow engine fetch keeps them exact (rounds
    7 and 11 respectively)."""
    t = str(t).upper()
    if t.endswith("[]"):
        return "LIST<" + type_class(t[:-2]) + ">"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return "DECIMAL"
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    return t  # HUGEINT, VARCHAR, DATE, BOOLEAN, ... stand alone


def arrow_type_class(t):
    """The same equivalence classes computed from a pyarrow type —
    the engine side's native type system under the driver's fetch."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "DECIMAL"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "VARCHAR"
    if pa.types.is_boolean(t):
        return "BOOLEAN"
    if pa.types.is_date(t):
        return "DATE"
    if pa.types.is_timestamp(t):
        return "TIMESTAMP"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BLOB"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "LIST<" + arrow_type_class(t.value_type) + ">"
    return str(t).upper()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and represent with enough digits
        return f"{v + 0.0:.10g}"
    if isinstance(v, dt.datetime):
        # pyarrow surfaces Spark's isAdjustedToUTC timestamps as
        # tz-aware UTC; DuckDB's fetch is naive wall-clock — align
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    return str(v)


def read_engine(qdir):
    """Read an engine result the way the driver does: pyarrow over
    the part files (exact decimals, arrow-native types)."""
    files = sorted(qdir.glob("*.parquet"))
    tbl = pa.concat_tables([pq.read_table(f) for f in files]) if files \
        else pq.read_table(qdir)
    cols = tbl.column_names
    types = [tbl.schema.field(c).type for c in cols]
    data = tbl.to_pydict()
    rows = list(zip(*[data[c] for c in cols])) if cols and tbl.num_rows \
        else [() for _ in range(tbl.num_rows)]
    return cols, types, rows


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
            raw_cols, raw_types, raw_rows = read_engine(qdir)
            got_cols = sorted(raw_cols)
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
        gidx = [raw_cols.index(c) for c in got_cols]
        eidx = [exp.columns.index(c) for c in exp_cols]
        got_types = [arrow_type_class(raw_types[i]) for i in gidx]
        exp_types = [type_class(exp.types[i]) for i in eidx]
        flagged = [(c, a, b) for c, a, b in zip(got_cols, got_types, exp_types)
                   if any(f in a or f in b for f in FORBIDDEN)]
        if flagged:
            _p(f"FAIL {name}: DECIMAL/HUGEINT report column(s) {flagged} — "
               "the driver hashes these differently per fetch path "
               "(pyarrow exact vs pandas float64); emit DOUBLE or VARCHAR")
            n_fail += 1
            continue
        if got_types != exp_types:
            bad = [(c, a, b) for c, a, b in
                   zip(got_cols, got_types, exp_types) if a != b]
            _p(f"FAIL {name}: column types differ (spark vs oracle): {bad}")
            n_fail += 1
            continue
        g = sorted(tuple(norm(r[i]) for i in gidx) for r in raw_rows)
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
                # footer metadata only — never materialize a possibly
                # corpus-sized dump just to count its rows
                n = sum(pq.ParquetFile(f).metadata.num_rows
                        for f in sorted(qdir.glob("*.parquet")))
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


