#!/usr/bin/env python3
"""Derive a larger-scale test dir from the driver's sf0.1 parquet by
key-offset replication, for the large-row-count oracle gate (dev tool —
the engine itself is pure Scala/Spark).

documents/embeddings x10 (doc ids offset by 1e6 per copy, so the two
tables stay joinable copy-for-copy), the customer/orders/lineitem graph
x4 (cust keys +1e7, order keys +1e8 per copy — FK edges stay intact
within each copy), everything else copied byte-for-byte.

Usage: python3 tools/make_bigsf.py [srcDir] [dstDir]
"""
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sfbig"

COPIES_DOCS = 10
COPIES_GRAPH = 4

import os
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def replicate(table, copies, remap):
    """remap: dict col -> offset-per-copy; other cols pass through."""
    cols = [r[0] for r in con.execute(
        f"describe select * from '{SRC}/{table}.parquet'").fetchall()]
    sel = ", ".join(
        f"{c} + k.k * {remap[c]} AS {c}" if c in remap else c for c in cols)
    con.execute(f"""
        COPY (SELECT {sel}
              FROM '{SRC}/{table}.parquet',
                   (SELECT unnest(range({copies})) AS k) k
              ORDER BY k.k, {cols[0]})
        TO '{DST}/{table}.parquet' (FORMAT parquet)""")
    n = con.execute(
        f"select count(*) from '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: x{copies} -> {n} rows")


replicate("documents", COPIES_DOCS, {"doc_id": 10**6})
replicate("embeddings", COPIES_DOCS, {"vec_id": 10**6})
replicate("customer", COPIES_GRAPH, {"c_custkey": 10**7})
replicate("orders", COPIES_GRAPH, {"o_orderkey": 10**8, "o_custkey": 10**7})
replicate("lineitem", COPIES_GRAPH, {"l_orderkey": 10**8})

for t in ["region", "nation", "supplier", "part", "events"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    print(f"{t}: copied")
