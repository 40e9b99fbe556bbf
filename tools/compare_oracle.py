#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata tables (registered under bare names), load the
matching Spark parquet from graft.Verify's outDir, sort columns by name and
rows by all values, and compare."""
import sys, json, math
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = sys.argv[3:] if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        expected = canon(con.sql(sql).df())
    except Exception as e:
        print(f"[{name}] ORACLE SQL ERROR: {str(e)[:300]}")
        fails += 1
        continue
    try:
        actual = canon(duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
    except Exception as e:
        print(f"[{name}] SPARK OUTPUT MISSING: {str(e)[:200]}")
        fails += 1
        continue
    if list(expected.columns) != list(actual.columns):
        print(f"[{name}] SCHEMA MISMATCH: oracle={list(expected.columns)} spark={list(actual.columns)}")
        fails += 1
        continue
    if len(expected) != len(actual):
        print(f"[{name}] ROWCOUNT MISMATCH: oracle={len(expected)} spark={len(actual)}")
        fails += 1
        continue
    eq = True
    for c in expected.columns:
        a, b = expected[c], actual[c]
        if a.dtype.kind == "f":
            same = ((a == b) | (a.isna() & b.isna()) | (abs(a - b) <= 0)).all()
        else:
            same = (a.astype(str) == b.astype(str)).all()
        if not same:
            eq = False
            bad = (a.astype(str) != b.astype(str))
            idx = bad[bad].index[:3]
            print(f"[{name}] VALUE MISMATCH col={c} rows={list(idx)}")
            for i in idx:
                print(f"    oracle={expected.loc[i].to_dict()}")
                print(f"    spark ={actual.loc[i].to_dict()}")
    if eq:
        print(f"[{name}] OK rows={len(expected)}")
    else:
        fails += 1
print(f"DONE fails={fails}")
sys.exit(1 if fails else 0)
