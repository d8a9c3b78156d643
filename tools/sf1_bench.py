"""sf1-scale bench: materialize a 10x replica of the sf0.1 tables (≈ SF 1:
lineitem ~6M rows, events 1M, documents 50k) into scratch parquet ONCE,
then time a set of headline queries against it — the scale-up evidence the
per-operator replication probe (scale_probe.py) does not give, because
here the queries run UNMODIFIED against a real on-disk dataset 10x the
bench default.

Replica shape: ids offset per replica copy (disjoint key spaces);
document text is perturbed per copy (a replica-tag token) so the
near-dedup corpus behaves like a natural crawl (near-dup pairs exist
within each copy's injected duplicates — not a degenerate k-clique of
identical corpora; the bucket cap guards the rest). Timestamps ride as
epoch-nanos longs, the engine-wide convention.

    python tools/sf1_bench.py            # writes/reuses /tmp/pqrs_sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquetranger_spark.queries import QUERIES, load_all  # noqa: E402
from parquetranger_spark.queries.common import load  # noqa: E402
from parquetranger_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/pqrs_sf1")
FACTOR = 10
OFFSET = 100_000_000

ID_COLS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
SMALL = ["region", "nation"]

QUERY_SET = [
    "sql_q1_pricing",
    "groupby_mean",
    "events_hourly_agg",
    "sessionization",
    "hash_partition_counts",
    "extend_roundtrip",
    "dedup_exact_text",
    "dedup_near_minhash",
    "topk_cosine_bruteforce",
    "sql_q5_local_supplier",
    "events_cube",
    "token_budget_sample",
]


def materialize(spark) -> None:
    if os.path.exists(os.path.join(DEST, "_DONE")):
        return
    os.makedirs(DEST, exist_ok=True)
    for t in SMALL:
        load(spark, SRC, t).write.mode("overwrite").parquet(f"{DEST}/{t}.parquet")
    for t, idc in ID_COLS.items():
        base = load(spark, SRC, t)
        out = base
        for i in range(1, FACTOR):
            rep = base.withColumn(idc, F.col(idc) + F.lit(i * OFFSET))
            if t == "documents":
                # perturb text per copy: replicated corpora must not form
                # identical k-cliques under near-dedup
                rep = rep.withColumn("text", F.concat(F.col("text"), F.lit(f" r{i}")))
            if t == "events":
                # keep user activity disjoint per copy (sessions don't
                # interleave across replicas) but times overlapping
                rep = rep.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000))
            if t == "orders":
                rep = rep.withColumn("o_custkey", F.col("o_custkey") + F.lit(i * OFFSET))
            if t == "lineitem":
                rep = rep.withColumn("l_suppkey", F.col("l_suppkey") + F.lit(i * OFFSET))
            out = out.unionByName(rep)
        out.repartition(32).write.mode("overwrite").parquet(f"{DEST}/{t}.parquet")
    open(os.path.join(DEST, "_DONE"), "w").write("ok")


def main() -> None:
    load_all()
    spark = get_spark("sf1-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("select count(*) from range(1000000)").collect()
    t0 = time.monotonic()
    materialize(spark)
    build_s = round(time.monotonic() - t0, 1)
    timings = {}
    for name in QUERY_SET:
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            QUERIES[name](spark, DEST).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            spark.catalog.clearCache()
            for r in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                r.unpersist(False)
            spark.sparkContext._jvm.System.gc()
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "sf1_headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": 1.0,
                "build_s": build_s,
                "note": "10x replica of sf0.1; ids offset per copy, doc text perturbed",
            }
        )
    )


if __name__ == "__main__":
    main()
