#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json, runs each oracle query in DuckDB over
the sf_dir parquet tables, loads the corresponding Spark parquet result, sorts
columns by name + rows by all columns, and compares values (exact for
ints/strings, tiny-epsilon report for floats so near-misses are visible).
Dev tool only — not part of the engine.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cmp_frames(name, spark_df, duck_df):
    problems = []
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} duck={len(b)}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av_ = av.astype(float)
                bv_ = bv.astype(float)
                exact = ((av_ == bv_) | (av_.isna() & bv_.isna())).all()
                if not exact:
                    diff = (av_ - bv_).abs().max()
                    problems.append(f"col {c}: float mismatch, max abs diff={diff}")
            else:
                eq = (av.astype(object).where(pd.notna(av), None)
                      == bv.astype(object).where(pd.notna(bv), None)) | (av.isna() & bv.isna())
                if not eq.all():
                    i = (~eq).idxmax()
                    problems.append(f"col {c}: value mismatch at row {i}: "
                                    f"spark={av[i]!r} duck={bv[i]!r}")
        except Exception as e:  # noqa: BLE001
            problems.append(f"col {c}: compare error {e}")
    return problems


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            fail += 1
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: no spark result: {e}")
            fail += 1
            continue
        problems = cmp_frames(name, spark_df, duck_df)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            fail += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
