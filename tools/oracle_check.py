#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: oracle_check.py SFDIR VERIFY_OUT_DIR

Reads each query's Spark-written parquet under VERIFY_OUT_DIR/<name>/,
re-runs the matching SQL from oracle_sql.json in DuckDB against the
raw tables in SFDIR, canonicalizes both (columns sorted by name, rows
sorted by string repr of all cells), and reports per-query
match/mismatch with a value-level diff preview.
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.apply(lambda row: "|".join(cell_repr(v) for v in row), axis=1)
    return df.loc[key.sort_values().index].reset_index(drop=True)


def cell_repr(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(cell_repr(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return repr(v)


def frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    problems = []
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(av, bv))
               if cell_repr(x) != cell_repr(y)]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"col {col}: {len(bad)}/{len(av)} cells differ; first at row {i}: "
                f"spark={cell_repr(x)} duck={cell_repr(y)}")
    return problems


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    sqls = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(sqls):
        files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
        if not files:
            print(f"[FAIL] {name}: no spark output found")
            n_bad += 1
            continue
        spark_df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                             ignore_index=True)
        try:
            duck_df = con.sql(sqls[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            n_bad += 1
            continue
        problems = frames_equal(canon(spark_df), canon(duck_df))
        if problems:
            print(f"[FAIL] {name}:")
            for p in problems:
                print(f"        {p}")
            n_bad += 1
        else:
            print(f"[ OK ] {name} ({len(spark_df)} rows)")
            n_ok += 1
    # queries with no oracle: rows-only check against the manifest so
    # a rows-only query that stopped producing output still fails
    manifest_path = os.path.join(outdir, "manifest.json")
    expected = set(json.load(open(manifest_path))) if os.path.exists(manifest_path) else None
    all_dumps = {os.path.basename(p) for p in glob.glob(os.path.join(outdir, "*"))
                 if os.path.isdir(p)}
    rows_only = sorted((expected - set(sqls)) if expected is not None
                       else (all_dumps - set(sqls)))
    for name in rows_only:
        files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
        if not files:
            print(f"[FAIL] {name}: no spark output found (rows-only query)")
            n_bad += 1
            continue
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        print(f"[rows] {name}: {rows} rows (no oracle)")
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
