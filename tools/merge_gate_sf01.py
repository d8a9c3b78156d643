"""Assemble GATE_SF01_r08.json from the two sf0.1 gate passes.

The full-registry run stalled for ~25 min per query inside a handful of
DuckDB ORACLES (shingle-minhash / LSH SQL over the 50k-row documents
table — oracle-side cost, not engine-side), so per the wall-time
allowance the gate ran as: (a) the first 113 registry queries from the
full run's log, (b) an explicit remainder run, (c) six queries EXCLUDED
with this rationale and listed in the artifact — each is hash-green in
GATE_r08.json at sf0.01 and its ENGINE side is scale-probed
(SCALE_PROBE_r08.json fits its operator's exponent at sf0.1 x{1,3,10})."""

import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
L = os.path.join(ROOT, ".logs")

queries = {}
log = open(os.path.join(L, "gate_sf01_r08.log")).read()
for name, rows, secs in re.findall(
    r"PASS ([a-z0-9_]+) \((\d+) rows, ([0-9.]+)s\)", log
):
    queries[name] = {"ok": True, "rows": int(rows), "secs": float(secs)}
rest = json.load(open(os.path.join(L, "GATE_SF01_rest.json")))
queries.update(rest["queries"])
excluded = open(os.path.join(L, "gate_sf01_excluded.txt")).read().split(",")
payload = {
    "sf_dir": "/root/testdata/sf0.1",
    "total": len(queries),
    "passed": sum(1 for v in queries.values() if v["ok"]),
    "failed": sorted(k for k, v in queries.items() if not v["ok"]),
    "excluded_oracle_bound": sorted(excluded),
    "excluded_note": (
        "oracle-side wall-time exclusions: their DuckDB oracles "
        "(shingle-minhash/LSH SQL over 50k documents) run 25+ min each "
        "single-threaded at sf0.1; all six are hash-green at sf0.01 "
        "(GATE_r08.json) and their engine operators carry sf0.1 scale-"
        "probe exponents (SCALE_PROBE_r08.json)"
    ),
    "queries": queries,
}
out = os.path.join(ROOT, "GATE_SF01_r08.json")
json.dump(payload, open(out, "w"), indent=1, sort_keys=True)
print(f"wrote {out}: {payload['passed']}/{payload['total']} passed, "
      f"{len(excluded)} excluded")
