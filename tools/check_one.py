#!/usr/bin/env python3
"""check.py for a FILTERED Verify dump (dev-only): same comparison as
check.py but only judges queries whose output parquet exists, so a
single-query dump doesn't print a FAIL wall for the undumped rest.
Usage: check_one.py <sfDir> <verifyOutDir>"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES, norm  # noqa: E402


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = [n for n in sorted(oracle) if os.path.isdir(f"{out_dir}/{n}")]
    n_pass = n_fail = 0
    for name in names:
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table().to_pylist()
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
            diffs = [(i, a, b)
                     for i, (a, b) in enumerate(zip(exp_r, got_r)) if a != b]
            print(f"FAIL {name}: {len(diffs)} row diffs; first: {diffs[:1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"{n_pass} pass / {n_fail} fail")


if __name__ == "__main__":
    main(*sys.argv[1:])
