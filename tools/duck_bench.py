#!/usr/bin/env python3
"""Time the 87 oracle queries in DuckDB (judge methodology: 32 threads,
warm, min-of-2) against an arbitrary data dir."""
import json, time, sys
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
oracle = json.load(open(oracle_path))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
con.execute("SET threads=32")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
times = {}
for name, sql in sorted(oracle.items()):
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}", file=sys.stderr)
            best = None
            break
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    if best is not None:
        times[name] = round(best, 2)
        print(f"{name:30s} {best:8.2f}", flush=True)
print(json.dumps({"total": round(sum(times.values()), 2), "n": len(times),
                  "queries": times}))
