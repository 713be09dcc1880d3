#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump (Spark side), runs the matching
SQL from oracle_sql.json in DuckDB over the same testdata tables, and
compares: column names (sorted), row counts, and values (rows sorted by all
columns, timestamps normalized to microseconds). Reports per-query PASS/FAIL.
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if str(df[c].dtype) == "object":
            import datetime
            df[c] = df[c].map(lambda v: bytes(v) if isinstance(v, (bytearray, memoryview)) else v)
            if df[c].map(lambda v: v is None or isinstance(v, datetime.date)).all() \
                    and df[c].notna().any():
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype) in ("int32", "int16", "int8", "uint32", "uint64"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pq.read_table(files[0]).to_pandas()
        if name not in oracle:
            print(f"----  {name}: no oracle (rows-only check): {len(spark_df)} rows")
            n_noracle += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        s, o = norm(spark_df.copy()), norm(duck_df.copy())
        if list(s.columns) != list(o.columns):
            print(f"FAIL  {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL  {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        bad = None
        for c in s.columns:
            sv, ov = s[c].tolist(), o[c].tolist()
            for i, (x, y) in enumerate(zip(sv, ov)):
                if not values_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        dtw = [c for c in s.columns if str(s[c].dtype) != str(o[c].dtype)]
        if bad:
            c, i, x, y = bad
            print(f"FAIL  {name}: value mismatch col={c} row={i}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            extra = f"  [dtype-warn {dtw} spark={[str(s[c].dtype) for c in dtw]} oracle={[str(o[c].dtype) for c in dtw]}]" if dtw else ""
            print(f"PASS  {name}: {len(s)} rows{extra}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
