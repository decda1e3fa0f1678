#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare with the Verify.scala parquet
dumps (column names sorted, row values hashed). Dev tool only — the shipped
library is pure Scala/Spark and does not use this."""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def canon(df):
    df = df[sorted(df.columns)]
    # normalize dtypes: ints -> int64, floats -> float64, timestamps/dates -> str
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        else:
            s = s.astype(str)
        out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, name)
        if not os.path.isdir(p):
            continue
        spark_df = load(outdir, name)
        if spark_df is None:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_df)} ok={len(spark_df) > 0}"
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(a)} duck={len(b)}"
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            idx = neq[neq].index[:3].tolist()
            diff = []
            for i in idx:
                diff.append(f"row{i}: spark={a.iloc[i].to_dict()} duck={b.iloc[i].to_dict()}")
            results[name] = "VALUE_MISMATCH " + " | ".join(diff)
        else:
            results[name] = f"MATCH rows={len(a)}"
    npass = sum(1 for v in results.values() if v.startswith("MATCH") or (v.startswith("ROWS_ONLY") and v.endswith("True")))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('MATCH') or v.endswith('ok=True') else 'FAIL'} {k}: {v}")
    print(f"\n{npass}/{len(results)} pass")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
