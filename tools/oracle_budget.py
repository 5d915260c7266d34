#!/usr/bin/env python3
"""Time every SparkEntry oracle in DuckDB at a given SF with a per-oracle
budget; exit 1 (loudly, naming the offender) if any exceeds it.

This is the builder-side tripwire for the r9 failure mode: one
pathological oracle (q68's un-materialized recursive CTE, 843.9 s at
sf0.01) stalled the DRIVER's correctness gate and zeroed the round's
artifact. A watchdog interrupts each oracle shortly past its budget, so
a re-introduced runaway (or a non-terminating recursive CTE) fails this
check in seconds instead of stalling the builder's suite the same way.

Run from OracleBudgetSpec (sbt test) or standalone:

    python3 tools/oracle_budget.py /tmp/oracle_sql.json /root/testdata/sf0.01 10.0
"""
import glob
import json
import os
import sys
import threading
import time

import duckdb


def main(oracle_json: str, sf_dir: str, budget_s: float) -> int:
    oracles = json.load(open(oracle_json))
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    # the catalog is whatever parquet sits in the SF dir — no second copy
    # of graft.Tables.names to drift out of sync
    for path in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        name = os.path.splitext(os.path.basename(path))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    slow, failed, timings = [], [], {}
    # hard stop a little past budget: enough headroom that a fast oracle
    # never sees a spurious interrupt, small enough that a runaway dies
    # in seconds, not minutes
    kill_after = max(2.0 * budget_s, budget_s + 5.0)
    for name, sql in sorted(oracles.items()):
        # per-oracle cursor (a duplicate connection sharing the catalog):
        # a watchdog interrupt that fires in the window between fetchall()
        # returning and cancel() lands on THIS cursor, which is closed
        # right after — it can never spuriously kill the next oracle
        # (ADVICE r10). The done-lock keeps fire() from touching a cursor
        # the main thread is already closing.
        cur = con.cursor()
        done = threading.Lock()
        killed = threading.Event()

        def fire(c=cur):
            if done.acquire(blocking=False):
                killed.set()
                c.interrupt()
                done.release()

        watchdog = threading.Timer(kill_after, fire)
        watchdog.start()
        t0 = time.time()
        try:
            cur.execute(sql).fetchall()
        except Exception as e:  # an oracle that errors also zeroes the gate
            dt = time.time() - t0
            # classify by whether OUR watchdog fired, not by elapsed time —
            # a genuine oracle error that surfaces near kill_after is a
            # FAIL, not a kill
            if killed.is_set():
                slow.append((name, dt))
                print(f"KILLED {name}: interrupted after {dt:.1f}s "
                      f"(budget {budget_s}s)", file=sys.stderr)
            else:
                failed.append(name)
                print(f"FAIL {name}: {str(e)[:200]}", file=sys.stderr)
            continue
        finally:
            # acquiring the lock means the timer either never fired or
            # finished its fire() — only then cancel and discard the cursor
            done.acquire()
            watchdog.cancel()
            cur.close()
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
