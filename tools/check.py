#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev-only, not part of
the library): reads each Verify output parquet, runs the matching oracle
SQL in DuckDB over the same sf dir, sorts columns by name, and compares
row-by-row values. Usage: check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetch_arrow_table().to_pylist()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            ).fetch_arrow_table().to_pylist()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        exp_r = [[norm(r[k]) for k in sorted(r)] for r in exp]
        got_r = [[norm(r[k]) for k in sorted(r)] for r in got]
        exp_cols = sorted(exp[0]) if exp else []
        got_cols = sorted(got[0]) if got else []
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif exp_r != got_r:
            n_fail += 1
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(exp_r, got_r)) if a != b]
            print(f"FAIL {name}: rows exp={len(exp_r)} got={len(got_r)} "
                  f"first-diffs={diffs[:3]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got_r)} rows)")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
