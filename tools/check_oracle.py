#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, run the matching oracle SQL in
DuckDB (tables = parquet files in sfDir), then compare the two result
sets: same row count, same column names (sorted), same values (exact
string equality after a stable per-cell normalization). This is a
conservative stand-in for the driver's hash compare - if this passes,
the driver compare should too.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_rows(df):
    # rows are SORTED before comparison, mirroring the driver's compare
    # (it sort_values the full frame before hashing) — registry queries
    # therefore don't need a presentation orderBy for certification,
    # and cert-only queries can skip the global sort in the benched plan
    df = df[sorted(df.columns)]
    return sorted(tuple(norm_cell(v) for v in row)
                  for row in df.itertuples(index=False))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        parts = glob.glob(f"{qdir}/*.parquet")
        got = pd.concat([pd.read_parquet(p) for p in parts]) if parts \
            else pd.DataFrame()
        if name not in oracle:
            print(f"SKIP  {name}: no oracle (rows={len(got)})")
            n_skip += 1
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL  {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        g, w = frame_rows(got), frame_rows(want)
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL  {name}: {len(bad)}/{len(g)} rows differ; first row {i}:")
            print(f"      spark : {a}")
            print(f"      duckdb: {b}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
