#!/usr/bin/env python3
"""Large-row-count oracle gate (dev tool): run the most expensive oracle
queries at the x10/x4 replicated scale (tools/make_bigsf.py) against
DuckDB and write a CORRECTNESS-style sidecar, to catch tolerance or
rounding drift that only appears at larger row counts.

Usage: python3 tools/bigsf_gate.py [sfDir] [verifyOut] [sidecarPath]
(expects `sbt "runMain graft.Verify <sfDir> <verifyOut> <names>"` to
have been run first — this script only does the DuckDB compare.)
"""
import json
import re
import subprocess
import sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sfbig"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_big"
SIDECAR = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_SFBIG.json"

p = subprocess.run(
    [sys.executable, "tools/check.py", SF, OUT],
    capture_output=True, text=True)
rows = {}
for line in p.stdout.splitlines():
    m = re.match(r"OK\s+(\S+)\s+\((\d+) rows\)", line)
    if m:
        rows[m.group(1)] = {"match": True, "rows": int(m.group(2))}
        continue
    m = re.match(r"FAIL\s+(\S+):?\s*(.*)", line)
    if m:
        rows[m.group(1)] = {"match": False, "detail": m.group(2)[:300]}
tail = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
out = {
    "purpose": ("oracle gate at replicated scale (documents/embeddings "
                "x10, customer/orders/lineitem x4 of sf0.1 via "
                "tools/make_bigsf.py) for the most expensive inventory "
                "queries — catches tolerance/rounding drift that only "
                "appears at larger row counts"),
    "sf_dir": SF,
    "summary": tail,
    "queries": rows,
}
with open(SIDECAR, "w") as f:
    json.dump(out, f, indent=1)
print(tail)
print(f"wrote {SIDECAR}")
