#!/usr/bin/env python3
"""Large-row-count oracle gate (dev tool): run the most expensive oracle
queries at the x10/x4 replicated scale (tools/make_bigsf.py) against
DuckDB and write a CORRECTNESS-style sidecar, to catch tolerance or
rounding drift that only appears at larger row counts.

Each oracle runs in its own process with a wall-clock timeout: the
pairwise/containment dedup oracles (d4, d6, d9) are quadratic in the
duplicate-group size and infeasible at x10 exact replication — the
ENGINE side completes them; the naive-SQL twin cannot. A timeout is
recorded as `match: null` with that explanation, not as a failure.

Usage: python3 tools/bigsf_gate.py [sfDir] [verifyOut] [sidecarPath]
                                   [twinJson]
(expects `sbt "runMain graft.Verify <sfDir> <verifyOut> <names>"` to
have been run first — this script only does the DuckDB compare.)

twinJson (r11): path to the JSON written by `runMain graft.TwinGate`
— the engine-side brute-force twin verdicts for the queries whose
naive-SQL oracle cannot finish at x10 (d4/d6/d9). Names present there
are decided by the twin instead of DuckDB, so the sidecar carries
12/12 decided rows instead of oracle-timeouts.
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402  (canon + TABLES)

import duckdb  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sfbig"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_big"
SIDECAR = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_SFBIG.json"
TIMEOUT_S = 420


def one(name, sql, q):
    try:
        con = duckdb.connect()
        for t in check.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
        s = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        oc, orr = check.canon(orows, ocols)
        sc, srr = check.canon(srows, scols)
        if oc != sc:
            q.put((False, f"cols {oc} vs {sc}"))
            return
        if len(orr) != len(srr):
            q.put((False, f"rows {len(orr)} vs {len(srr)}"))
            return
        for i, (a, b) in enumerate(zip(orr, srr)):
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    if not abs(x - y) <= 1e-9 * max(1, abs(x), abs(y)):
                        q.put((False,
                               f"value mismatch row {i}: {x!r} vs {y!r}"))
                        return
                elif x != y:
                    q.put((False, f"value mismatch row {i}: {x!r} vs {y!r}"))
                    return
        q.put((True, len(srr)))
    except Exception as e:  # noqa: BLE001 — report, don't crash the gate
        q.put((False, str(e)[:200]))


def main():
    osql = json.load(open(f"{OUT}/oracle_sql.json"))
    twin = {}
    if len(sys.argv) > 4 and os.path.exists(sys.argv[4]):
        twin = json.load(open(sys.argv[4]))
    res = {}
    for name in sorted(osql):
        if name in twin:
            t = dict(twin[name])
            t.setdefault(
                "detail",
                "decided by the engine-side brute-force twin "
                "(graft.TwinGate: UDF shingling + full posting-list "
                "candidate join + exact verify; d6 via driver-side "
                "union-find) — the naive DuckDB CTE is quadratic in "
                "the replicated duplicate-group size and infeasible "
                "at x10")
            res[name] = t
            print(f"TWIN {'OK' if t.get('match') else 'FAIL'} {name} "
                  f"{t.get('rows', '?')} rows", flush=True)
            continue
        q = mp.Queue()
        t0 = time.time()
        p = mp.Process(target=one, args=(name, osql[name], q))
        p.start()
        p.join(TIMEOUT_S)
        if p.is_alive():
            p.terminate()
            p.join()
            res[name] = {
                "match": None,
                "detail": (f"DuckDB oracle timeout >{TIMEOUT_S}s — the "
                           "naive-SQL twin is quadratic in the replicated "
                           "duplicate-group size; the engine result is "
                           "present and completed"),
            }
            print(f"TIMEOUT {name} ({time.time() - t0:.0f}s)", flush=True)
        else:
            ok, info = q.get()
            res[name] = ({"match": True, "rows": info} if ok
                         else {"match": False, "detail": str(info)})
            print(f"{'OK' if ok else 'FAIL'} {name} "
                  f"({time.time() - t0:.0f}s) {info}", flush=True)
    n_ok = sum(1 for v in res.values() if v["match"])
    n_bad = sum(1 for v in res.values() if v["match"] is False)
    n_to = sum(1 for v in res.values() if v["match"] is None)
    summary = f"== {n_ok} ok, {n_bad} bad, {n_to} oracle-timeout =="
    out = {
        "purpose": ("oracle gate at replicated scale (documents/embeddings "
                    "x10, customer/orders/lineitem x4 of sf0.1 via "
                    "tools/make_bigsf.py) for the most expensive inventory "
                    "queries — catches tolerance/rounding drift that only "
                    "appears at larger row counts; queries whose naive-SQL "
                    "twin is quadratic in duplicate-group size (d4/d6/d9) "
                    "are decided by the engine-side brute-force twin "
                    "(graft.TwinGate) instead of DuckDB"),
        "sf_dir": SF,
        "summary": summary,
        "queries": res,
    }
    with open(SIDECAR, "w") as f:
        json.dump(out, f, indent=1)
    print(summary)
    print(f"wrote {SIDECAR}")


if __name__ == "__main__":
    main()
