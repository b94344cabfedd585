#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing oracle_sql.json on the same parquet tables, compare
row counts, schemas (column names), and exact values (columns sorted by name,
rows sorted by all columns). Usage:
    python3 tools/local_check.py [verify_out_dir] [sf_dir]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def normalize(df):
    df = df[sorted(df.columns)]
    # tz-aware -> naive, categoricals -> plain
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
    return df.reset_index(drop=True)

def values_equal(a, b):
    if a.shape != b.shape:
        return False, f"shape {a.shape} vs {b.shape}"
    # sort rows by all columns for order-insensitive compare
    cols = list(a.columns)
    a = a.sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = b.sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float); bv = bv.astype(float)
            eq = (av.isna() & bv.isna()) | (av == bv)
            if not eq.all():
                i = (~eq).idxmax()
                return False, f"col {c} row {i}: {av[i]!r} != {bv[i]!r} (exact float)"
        else:
            eq = (av.isna() & bv.isna()) | (av.astype(object) == bv.astype(object))
            if not eq.all():
                i = (~eq).idxmax()
                return False, f"col {c} row {i}: {av[i]!r} != {bv[i]!r}"
    return True, ""

queries = sorted([d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d))])

# Registered-query manifest (written by Verify): any registered query with no
# output dir FAILED in Verify — without this check a rows-only query that
# throws would silently vanish from the gate.
manifest_path = os.path.join(out_dir, "queries.json")
registered = json.load(open(manifest_path)) if os.path.exists(manifest_path) else []
n_pass = n_fail = n_rowsonly = 0
for q in queries:
    files = glob.glob(os.path.join(out_dir, q, "*.parquet"))
    if not files:
        print(f"FAIL  {q}: no parquet output")
        n_fail += 1
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    if q not in oracle:
        status = "ROWS-ONLY" if len(spark_df) > 0 else "ROWS-ONLY-EMPTY(!)"
        print(f"{status:>9}  {q}: rows={len(spark_df)}")
        n_rowsonly += 1
        continue
    try:
        duck_df = con.sql(oracle[q]).df()
    except Exception as e:
        print(f"FAIL  {q}: oracle SQL error: {e}")
        n_fail += 1
        continue
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"FAIL  {q}: columns {list(a.columns)} vs {list(b.columns)}")
        n_fail += 1
        continue
    ok, msg = values_equal(a, b)
    if ok:
        print(f"PASS  {q}: rows={len(a)}")
        n_pass += 1
    else:
        print(f"FAIL  {q}: {msg}")
        n_fail += 1

missing = (set(oracle) | set(registered)) - set(queries)
for q in sorted(missing):
    print(f"FAIL  {q}: registered but no query output (threw in Verify?)")
    n_fail += 1
print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only "
      f"of {len(queries)} queries")
sys.exit(1 if n_fail else 0)
