"""Empirical scaling probe: run the heavyweight pipeline operators on
1x / 3x / 10x replicas of the sf0.1 corpus (id-offset unions — no disk
writes) and report wall time + the fitted scaling exponent.

A bucketed/candidate-scoped operator should scale ~linearly (exponent
≈ 1); an accidental all-pairs or quadratic-expression shape shows up as
exponent ≥ 1.5 long before it would OOM a cluster. Run:

    python tools/scale_probe.py            # default sf0.1
    SPARK_GRAFT_SF_DIR=... python tools/scale_probe.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquetranger_spark.operators.curation import repetition_stats  # noqa: E402
from parquetranger_spark.operators.dedup import exact_dedup, near_dedup_minhash  # noqa: E402
from parquetranger_spark.operators.temporal import asof_join_backward  # noqa: E402
from parquetranger_spark.queries.common import load  # noqa: E402
from parquetranger_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = [1, 3, 10]


def replicate(df, id_col: str, factor: int, offset: int = 10_000_000):
    out = df
    for i in range(1, factor):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * offset))
        )
    # replicas arrive as extra partitions, mirroring extra input splits
    return out.repartition(32)


def probe(spark):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "ts", "event_type")

    ops = {
        # near-dedup: bucketed LSH; candidate count grows with injected
        # replicas (every replica set is mutually near-dup), so expect
        # slightly superlinear on this adversarial corpus
        "near_dedup_minhash": lambda d, e: near_dedup_minhash(d).count(),
        "exact_dedup": lambda d, e: exact_dedup(d).count(),
        "repetition_stats": lambda d, e: repetition_stats(d)
        .agg(F.sum("top_word_count"))
        .collect(),
        "asof_join": lambda d, e: asof_join_backward(
            e.where(F.col("event_type") == "purchase"),
            e.where(F.col("event_type") == "view").select("user_id", "ts"),
            ["user_id"],
            "ts",
        ).count(),
    }
    results = {}
    for name, fn in ops.items():
        times = []
        for f in FACTORS:
            d = replicate(docs, "doc_id", f)
            e = replicate(ev, "event_id", f)
            t0 = time.monotonic()
            fn(d, e)
            dt = time.monotonic() - t0
            times.append(round(dt, 2))
            spark.catalog.clearCache()
        # fit t = c * n^k over the probed factors (least squares in logs)
        xs = [math.log(f) for f in FACTORS]
        ys = [math.log(t) for t in times]
        xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
        k = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
            (x - xbar) ** 2 for x in xs
        )
        results[name] = {"times_sec": dict(zip(map(str, FACTORS), times)), "exponent": round(k, 2)}
        print(f"# {name}: {results[name]}", file=sys.stderr)
    return results


if __name__ == "__main__":
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm
    spark.sql("select count(*) from range(1000000)").collect()
    print(json.dumps({"sf_dir": SF_DIR, "factors": FACTORS, "ops": probe(spark)}))
