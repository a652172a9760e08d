#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry over the same parquet tables,
loads the Spark result parquet written by graft.Verify, sorts columns by
name and rows by all columns, and value-compares.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
(dev tool only — the engine itself is pure Scala/Spark)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_bad += 1
            continue
        try:
            s = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in s.description]
            srows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {str(e)[:200]}")
            n_bad += 1
            continue
        otypes = {d[0]: d[1] for d in o.description}
        stypes = {d[0]: d[1] for d in s.description}
        oc, orows = canon(orows, ocols)
        sc, srows = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
            n_bad += 1
        elif any(otypes[c] != stypes[c] for c in oc):
            # the driver's hash is type-sensitive (e.g. DuckDB sum() of ints
            # is HUGEINT vs Spark BIGINT) even when Python values compare equal
            bad = [(c, otypes[c], stypes[c]) for c in oc
                   if otypes[c] != stypes[c]]
            print(f"FAIL {name}: column types differ {bad}")
            n_bad += 1
        elif orows != srows:
            diffs = [i for i, (a, b) in enumerate(zip(orows, srows)) if a != b]
            print(f"FAIL {name}: rows differ "
                  f"(oracle {len(orows)} vs spark {len(srows)}; "
                  f"first diffs {diffs[:3]})")
            for i in diffs[:2]:
                print(f"   oracle[{i}]={orows[i]}")
                print(f"   spark [{i}]={srows[i]}")
            if len(orows) != len(srows):
                print(f"   oracle head={orows[:2]} spark head={srows[:2]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(orows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
