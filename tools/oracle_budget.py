#!/usr/bin/env python3
"""Time every SparkEntry oracle in DuckDB at a given SF with a per-oracle
budget; exit 1 (loudly, naming the offender) if any exceeds it.

This is the builder-side tripwire for the r9 failure mode: one
pathological oracle (q68's un-materialized recursive CTE, 843.9 s at
sf0.01) stalled the DRIVER's correctness gate and zeroed the round's
artifact. Run from OracleBudgetSpec (sbt test) or standalone:

    python3 tools/oracle_budget.py /tmp/oracle_sql.json /root/testdata/sf0.01 10.0
"""
import duckdb, json, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(oracle_json: str, sf_dir: str, budget_s: float) -> int:
    oracles = json.load(open(oracle_json))
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    slow, failed, timings = [], [], {}
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception as e:  # an oracle that errors also zeroes the gate
            failed.append(name)
            print(f"FAIL {name}: {str(e)[:200]}", file=sys.stderr)
            continue
        dt = time.time() - t0
        timings[name] = round(dt, 2)
        if dt > budget_s:
            slow.append((name, dt))
    print(json.dumps({"budget_s": budget_s, "n": len(oracles),
                      "slow": [n for n, _ in slow], "failed": failed,
                      "timings": timings}))
    for name, dt in slow:
        print(f"OVER-BUDGET {name}: {dt:.1f}s > {budget_s}s", file=sys.stderr)
    return 1 if (slow or failed) else 0


if __name__ == "__main__":
    oracle_json = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oracle_sql.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    sys.exit(main(oracle_json, sf_dir, budget))
