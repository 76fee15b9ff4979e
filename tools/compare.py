#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling, not part of
the library): runs Verify-dumped parquet against the oracle SQL in DuckDB
and compares rows/schema/values with columns sorted by name, like the
driver does.

Usage: python3 tools/compare.py OUTDIR SFDIR [query ...]
"""
import json, sys, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pq.read_table(files[0]).to_pandas()

def canon(df):
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    # NO rounding here: the driver hashes bit patterns, so this gate must
    # be bit-exact too (a round(6) tolerance masked the -0.0 vs +0.0
    # msprt_peek mismatch in round 12).
    return df


def bit_diff_cols(s, o):
    """Columns whose float values are pandas-equal but not bit-identical
    (the -0.0 vs +0.0 case the driver's hash catches and `.equals` hides)."""
    import numpy as np
    bad = []
    for c in s.columns:
        if np.issubdtype(s[c].dtype, np.floating):
            a = s[c].to_numpy(dtype="float64").view(np.uint64)
            b = o[c].to_numpy(dtype="float64").view(np.uint64)
            # canonicalize NaN bit patterns (equals() already matched NaNs)
            nan = np.isnan(s[c].to_numpy(dtype="float64"))
            if not np.array_equal(a[~nan], b[~nan]):
                bad.append(c)
    return bad

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
        except Exception:
            pass
    bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"{name}: NO SPARK DUMP"); bad += 1; continue
        try:
            ora = con.execute(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); bad += 1; continue
        s, o = canon(spark_df), canon(ora)
        if list(s.columns) != list(o.columns):
            print(f"{name}: SCHEMA {list(s.columns)} vs {list(o.columns)}"); bad += 1
        elif len(s) != len(o):
            print(f"{name}: ROWS {len(s)} vs {len(o)}"); bad += 1
        elif not s.equals(o):
            neq = (s != o) & ~(s.isna() & o.isna())
            print(f"{name}: VALUES differ in {int(neq.any(axis=1).sum())} rows")
            mask = neq.any(axis=1)
            print(pd.concat([s[mask].head(3), o[mask].head(3)]))
            bad += 1
        elif (bd := bit_diff_cols(s, o)):
            print(f"{name}: BIT MISMATCH (likely -0.0 vs +0.0) in cols {bd}")
            bad += 1
        else:
            print(f"{name}: OK ({len(s)} rows)")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
