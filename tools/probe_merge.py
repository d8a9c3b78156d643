"""Merge N scale-probe runs best-of-N per (op, factor) cell and refit.

Round-10 finding: single-shot few-second probe cells are noisy even on
an idle host (pq_adc_topk read exponent 0.63 then -0.04 across two
back-to-back idle runs; ann_index_pq_query 0.40 then 1.03), while
structural ops are stable (cc_star_chain 0.27/0.26, grown-index
0.09/0.10). Noise only ever ADDS time, so the best wall per cell is the
defensible estimator — run the probe twice in the serialized chain and
merge:

    python tools/scale_probe.py > run1.json
    python tools/scale_probe.py > run2.json
    python tools/probe_merge.py run1.json run2.json > SCALE_PROBE_r{N}.json

The output keeps every raw run under "runs" so the merge is auditable.
"""

from __future__ import annotations

import json
import math
import sys


def fit(factors, times):
    xs = [math.log(f) for f in factors]
    ys = [math.log(t) for t in times]
    xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
    return sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
        (x - xbar) ** 2 for x in xs
    )


def main(paths):
    runs = [json.load(open(p)) for p in paths]
    factors = runs[0]["factors"]
    ops_runs = [r["ops"] for r in runs]
    merged = {}
    for op in ops_runs[0]:
        cells = {}
        for f in factors:
            cells[str(f)] = round(
                min(r[op]["times_sec"][str(f)] for r in ops_runs if op in r), 2
            )
        merged[op] = {
            "times_sec": cells,
            "exponent": round(fit(factors, [cells[str(f)] for f in factors]), 2),
        }
    json.dump(
        {
            "sf_dir": runs[0]["sf_dir"],
            "factors": factors,
            "protocol": (
                f"{len(runs)} full independent idle-host probe runs; per "
                "(op, factor) cell the BEST wall is kept before the "
                "log-log fit (noise only ever adds time at the few-second "
                "cell scale); raw runs recorded under 'runs'"
            ),
            "ops": merged,
            "runs": ops_runs,
        },
        sys.stdout,
        indent=1,
    )
    print()


if __name__ == "__main__":
    main(sys.argv[1:])
