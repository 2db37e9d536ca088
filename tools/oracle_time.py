#!/usr/bin/env python3
"""Time each oracle SQL from an oracle_sql.json in DuckDB over a given
sf dir — the local profiling companion to oracle_check.py, used to keep
every replay under the sweep time budget as document sizes grow.

Usage: python3 tools/oracle_time.py <sfdir> <oracle_sql.json> [only,...]
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, path = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(path))
    rows = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            n = len(con.sql(oracle[name]).fetchall())
            err = ""
        except Exception as e:
            n, err = -1, str(e).splitlines()[0][:120]
        dt = time.time() - t0
        rows.append((dt, name, n, err))
        print(f"{dt:8.2f}s  {name}  rows={n}  {err}", flush=True)
    rows.sort(reverse=True)
    print("\nslowest:")
    for dt, name, n, err in rows[:12]:
        print(f"{dt:8.2f}s  {name}")

if __name__ == "__main__":
    main()
