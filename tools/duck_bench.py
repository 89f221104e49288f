#!/usr/bin/env python3
"""Time the oracle queries in DuckDB (judge methodology: 32 threads,
warm, min-of-2) against an arbitrary data dir.

Usage: duck_bench.py SFDIR ORACLE_JSON [TIMEOUT_SEC]

TIMEOUT_SEC (default 120) interrupts a query that runs past the limit and
records it as DNF at the limit value — the graph kernels (q48 triangle
count, q49 label propagation, q55 k-core) exceed any reasonable budget as
recursive CTEs even at sf0.1, and without the cap the catalog run never
finishes."""
import json, time, sys, threading
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
oracle = json.load(open(oracle_path))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
con.execute("SET threads=32")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
times = {}
dnf = []
for name, sql in sorted(oracle.items()):
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        try:
            con.execute(sql).fetchall()
        except duckdb.InterruptException:
            print(f"DNF  {name}: >{timeout:.0f}s (recorded at the cap)",
                  file=sys.stderr)
            dnf.append(name)
            best = timeout
            break
        except Exception as e:
            print(f"FAIL {name}: {e}", file=sys.stderr)
            best = None
            break
        finally:
            timer.cancel()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    if best is not None:
        times[name] = round(best, 2)
        print(f"{name:30s} {best:8.2f}", flush=True)
print(json.dumps({"total": round(sum(times.values()), 2), "n": len(times),
                  "dnf": dnf, "queries": times}))
