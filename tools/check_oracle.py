#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, load the Verify parquet output, sort
columns by name + rows by value, and compare exactly (hash-style).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        e, g = canon(exp), canon(got)
        if list(e.columns) != list(g.columns):
            print(f"FAIL {name}: columns exp={list(e.columns)} got={list(g.columns)}")
            n_bad += 1
            continue
        if len(e) != len(g):
            print(f"FAIL {name}: rows exp={len(e)} got={len(g)}")
            n_bad += 1
            continue
        mismatch = []
        for c in e.columns:
            ec, gc = e[c], g[c]
            if pd.api.types.is_float_dtype(ec):
                eq = (ec.values == gc.values) | (pd.isna(ec.values) & pd.isna(gc.values))
            else:
                eq = (ec.isna() & gc.isna()) | (ec == gc)
            if not eq.all():
                bad = int((~eq).sum())
                i = int(np.argmax(~np.asarray(eq)))
                mismatch.append(f"{c}({bad} rows, first: exp={ec.iloc[i]!r} got={gc.iloc[i]!r})")
        if mismatch:
            print(f"FAIL {name}: value mismatch: {'; '.join(mismatch[:5])}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(e)} rows, {len(e.columns)} cols)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
