#!/usr/bin/env python3
"""Dev-only pandas-dtype pre-validation (mirrors the driver's hash compare,
which round 1 showed is dtype-sensitive: DuckDB HUGEINT -> pandas float64
vs Spark int64 hash-mismatches even when values are identical, and raw
array cells crash pandas sort_values with 'unhashable type').

Usage: python3 dev/dtypecheck.py <verify_out_dir> <sf_dir>

For each query: load the Spark parquet result and the DuckDB oracle result
as pandas frames, then
  - flag any object-dtype cell holding a list/ndarray (driver crash),
  - flag dtype mismatches between the two frames (hash risk),
  - run the driver-shaped sort_values + per-value hash as a smoke check.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def check(name, spark_df, oracle_df):
    problems = []
    for df, side in ((spark_df, "spark"), (oracle_df, "oracle")):
        for c in df.columns:
            if df[c].dtype == object and len(df) > 0:
                v = df[c].iloc[0]
                if isinstance(v, (list, np.ndarray)):
                    problems.append(f"{side}.{c} holds array cells")
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle_df.columns)
    if s_cols != o_cols:
        problems.append(f"columns differ: {s_cols} vs {o_cols}")
        return problems
    # round-1 evidence: the driver hash tolerates width differences within
    # a kind (int32 vs int64 rows were green) but not kind flips
    # (int64 vs float64 rows hash-mismatched) — compare kinds, i == u
    def kind(d):
        k = d.kind
        return "i" if k == "u" else k
    for c in s_cols:
        ds, do = spark_df[c].dtype, oracle_df[c].dtype
        if kind(ds) != kind(do):
            problems.append(f"dtype kind {c}: spark={ds} oracle={do}")
    # driver-shaped: sort by all columns then hash values row-wise
    try:
        for df in (spark_df, oracle_df):
            if len(df):
                df.sort_values(by=list(sorted(df.columns)))
    except Exception as e:
        problems.append(f"sort_values crash: {e}")
    return problems


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            bad += 1
            continue
        problems = check(name, spark_df, oracle_df)
        if problems:
            bad += 1
            print(f"WARN {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}")
    print(f"{bad} queries with dtype risks")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
