#!/usr/bin/env python3
"""Build the 'sf1' amortization corpus (dev-only, driver-side python —
reproduces the BASELINE.md "sf1 amortization measurement" input):
documents = 10 replicas of the sf0.1 corpus with WORD-PERMUTED texts
(per-(replica, doc) seeded shuffle -> distinct shingle sets, so dedup
kernels see a real 10x corpus with identical length/stopword/quality
signal distributions), doc_id = replica * 1_000_000 + doc_id; every
other table symlinks to sf0.1. Usage:

    python3 tools/make_sf1.py /root/testdata/sf0.1 /tmp/sf1
"""
import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]


def main(src, dst):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM '{src}/documents.parquet' ORDER BY doc_id").fetchall()
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for rep in range(10):
        for doc_id, text, lang, source, n_chars in rows:
            words = text.split(" ")
            random.Random((rep, doc_id).__hash__() & 0x7FFFFFFF).shuffle(words)
            out["doc_id"].append(rep * 1_000_000 + doc_id)
            out["text"].append(" ".join(words))
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(n_chars)
    pq.write_table(pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "source": pa.array(out["source"], pa.string()),
        "n_chars": pa.array(out["n_chars"], pa.int64()),
    }), f"{dst}/documents.parquet")
    for t in TABLES:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)
    n = con.execute(f"SELECT COUNT(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    print(f"sf1 at {dst}: {n} documents")


if __name__ == "__main__":
    main(*sys.argv[1:])
