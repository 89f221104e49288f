#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query output
parquet under OUTDIR, run the oracle SQL from oracle_sql.json in DuckDB over
the SFDIR parquet tables, canonicalize (sort columns by name, round floats to
6dp, render timestamps ISO-UTC), and diff.

Usage: python3 tools/compare.py /tmp/verify_r1 /root/testdata/sf0.01
"""
import sys, json, glob, os
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            # The driver hashes RENDERED strings, where -0.0 != 0.0 — pandas
            # .equals treats them as equal, which let signed-zero mismatches
            # (x58/x72, round 6) pass locally while failing the driver gate.
            # Normalize -0.0 -> 0.0 (+0.0) and compare the repr string so the
            # local gate sees exactly what the driver hashes.
            df[c] = (df[c].astype("float64").round(6) + 0.0).map(repr)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        elif df[c].dtype == "object":
            df[c] = df[c].apply(
                lambda v: json.dumps([str(x) for x in v]) if isinstance(v, (list, tuple))
                else (json.dumps([str(x) for x in v.tolist()]) if hasattr(v, "tolist") else v))
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                pass
    return df.reset_index(drop=True)

con = duckdb.connect()
# Bound DuckDB's memory so a recursive-CTE oracle twin that exhausts RAM at
# big fixtures (q48/q55 at sf0.1+) surfaces as a per-query ERROR line instead
# of the whole compare process being OOM-killed mid-run.
con.sql("SET memory_limit='48GB'")
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

n_pass = n_fail = 0
names = sorted(oracle)
for name in names:
    spark_path = f"{outdir}/{name}"
    files = glob.glob(f"{spark_path}/*.parquet")
    if not files:
        print(f"MISSING {name} (no spark output)")
        n_fail += 1
        continue
    try:
        got = canon(pd.read_parquet(spark_path))
        exp = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"ERROR   {name}: {str(e).splitlines()[0][:160]}")
        n_fail += 1
        continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL    {name}: columns {list(got.columns)} != {list(exp.columns)}")
        n_fail += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL    {name}: rows {len(got)} != {len(exp)}")
        n_fail += 1
        continue
    if got.equals(exp):
        print(f"PASS    {name} ({len(got)} rows)")
        n_pass += 1
    else:
        diff = (got != exp) & ~(got.isna() & exp.isna())
        bad = diff.any(axis=1)
        print(f"FAIL    {name}: {int(bad.sum())}/{len(got)} rows differ")
        i = bad.idxmax()
        print(f"  spark : {got.loc[i].to_dict()}")
        print(f"  oracle: {exp.loc[i].to_dict()}")
        n_fail += 1

print(f"\n{n_pass} pass / {n_fail} fail / {len(names)} total")
sys.exit(1 if n_fail else 0)
