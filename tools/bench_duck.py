#!/usr/bin/env python3
"""DuckDB baseline bench (dev-only): runs each oracle SQL at the given SF
with 1 warmup + median of 5, mirroring graft.Bench's protocol.
Usage: bench_duck.py <sfDir> <oracle_sql.json> [threads]
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, threads="8"):
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    out = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            con.execute(sql).fetchall()  # warmup
            runs = []
            for _ in range(5):
                t0 = time.time()
                con.execute(sql).fetchall()
                runs.append(time.time() - t0)
            out[name] = round(statistics.median(runs), 4)
        except Exception as e:
            out[name] = -1.0
            print(f"# {name} failed: {e}", file=sys.stderr)
    total = sum(v for v in out.values() if v >= 0)
    print(json.dumps({"metric": "total", "value": round(total, 3),
                      "unit": "sec", "queries": out, "sf": sf_dir}))


if __name__ == "__main__":
    main(*sys.argv[1:])
