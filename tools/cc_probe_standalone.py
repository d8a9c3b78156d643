"""Standalone cc_star_chain measurement (round-10 verdict #3): the same
pathological-chain probe tools/scale_probe.py times, but in a FRESH
session with zero prior state — isolating the operator from probe-session
MemoryStore pressure (the r9 probe pinned every setup-era checkpoint in
keep_ids, so grown-index build leakage inflated later ops).

Run: python tools/cc_probe_standalone.py [repeats]
Prints one JSON line: {"runs": [{"1": s, "3": s, "10": s, "exponent": k}, ...]}
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquetranger_spark.operators.dedup import connected_components_star  # noqa: E402
from parquetranger_spark.session import get_spark  # noqa: E402

FACTORS = [1, 3, 10]


def run_once(spark):
    times = {}
    for f in FACTORS:
        t0 = time.monotonic()
        (
            connected_components_star(
                spark.range(100_000 * f - 1).select(
                    F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
                ),
                max_iter=40,
            )
            .where(F.col("component") != 0)
            .count()
        )
        times[str(f)] = round(time.monotonic() - t0, 2)
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist(False)
        spark.sparkContext._jvm.System.gc()
    xs = [math.log(f) for f in FACTORS]
    ys = [math.log(times[str(f)]) for f in FACTORS]
    xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
    k = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
        (x - xbar) ** 2 for x in xs
    )
    times["exponent"] = round(k, 2)
    return times


if __name__ == "__main__":
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("cc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("select count(*) from range(1000000)").collect()
    runs = []
    for _ in range(repeats):
        r = run_once(spark)
        print(f"# run: {r}", file=sys.stderr)
        runs.append(r)
    print(json.dumps({"runs": runs}))
