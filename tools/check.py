#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (Spark result), runs the matching SQL
from <out_dir>/oracle_sql.json in DuckDB over <sf_dir>/*.parquet, then
compares: schema (column names), row count, and exact values after sorting
columns by name and rows by all columns (mirrors the driver's
sort-columns-then-hash compare). Exits nonzero on any mismatch.

NOTE: dev-only tooling — the engine itself is pure Scala/Spark.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def arrow_type_str(t):
    """Normalized Arrow type name: collapses aliases that hash identically
    at the driver (large_string vs string) but keeps width/precision
    differences (int64 vs decimal128) that make its hash diverge."""
    import re
    s = str(t)
    s = s.replace("large_string", "string").replace("large_binary", "binary")
    # Spark parquet INT96 timestamps surface as ns in pyarrow while DuckDB
    # emits us — the driver's hasher canonicalizes timestamp values (every
    # such pair has hash-matched at the gate), so unit is not a divergence.
    s = re.sub(r"timestamp\[(ns|us|ms|s)", "timestamp[us", s)
    return s


def type_mismatches(out_dir, name, con, sql):
    """Compare physical Arrow types of the Spark parquet output vs the
    DuckDB oracle result — the exact surface the driver hashes on."""
    import glob
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        return ["no spark parquet output"]
    spark_schema = pq.read_schema(files[0])
    oracle_schema = con.sql(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema
    spark_types = {f.name: arrow_type_str(f.type) for f in spark_schema}
    oracle_types = {f.name: arrow_type_str(f.type) for f in oracle_schema}
    bad = []
    for col in sorted(set(spark_types) & set(oracle_types)):
        if spark_types[col] != oracle_types[col]:
            bad.append(f"{col}: spark={spark_types[col]} oracle={oracle_types[col]}")
    return bad


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    checked = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        checked += 1
        try:
            spark_src = f"'{out_dir}/{name}/*.parquet'"
            spark_cols = sorted(con.sql(f"SELECT * FROM {spark_src} LIMIT 0").columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM {spark_src} ORDER BY ALL"
            ).fetchall()

            oracle_cols = sorted(con.sql(f"SELECT * FROM ({sql}) LIMIT 0").columns)
            oracle_rows = con.sql(
                f"SELECT {', '.join(oracle_cols)} FROM ({sql}) ORDER BY ALL"
            ).fetchall()
        except Exception as e:
            failures.append((name, f"ERROR: {e}"))
            print(f"FAIL  {name}: {e}")
            continue

        if spark_cols != oracle_cols:
            failures.append((name, f"schema {spark_cols} != {oracle_cols}"))
            print(f"FAIL  {name}: schema {spark_cols} != {oracle_cols}")
            continue
        if len(spark_rows) != len(oracle_rows):
            failures.append((name, f"rows {len(spark_rows)} != {len(oracle_rows)}"))
            print(f"FAIL  {name}: rows {len(spark_rows)} != {len(oracle_rows)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, oracle_rows)):
            if tuple(map(canon, a)) != tuple(map(canon, b)):
                bad = (i, a, b)
                break
        if bad:
            failures.append((name, f"value mismatch at sorted row {bad[0]}"))
            print(f"FAIL  {name}: row {bad[0]}\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            continue
        try:
            tbad = type_mismatches(out_dir, name, con, sql)
        except Exception as e:
            tbad = [f"type-lint error: {e}"]
        if tbad:
            failures.append((name, f"arrow type mismatch: {'; '.join(tbad)}"))
            print(f"FAIL  {name}: ARROW TYPE {'; '.join(tbad)}")
        else:
            print(f"OK    {name} ({len(spark_rows)} rows, {len(spark_cols)} cols)")

    print(f"\n{checked - len(failures)}/{checked} passed"
          + ("" if checked == len(oracles)
             else f" (FILTERED — {len(oracles)} oracle entries total)"))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
