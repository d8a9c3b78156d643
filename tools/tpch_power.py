"""TPC-H power run: execute all 22 query shapes sequentially at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) via the noop sink and print one
JSON line with per-query and total wall times — the classic
single-stream metric, over the engine's decorrelated/broadcast-planned
implementations (queries/tpch.py + queries/compute.py).

Measurement protocol (round-8 verdict #5 — the +16% r8 'regression' was
host contention on unchanged plans): per query, ONE untimed warm pass
(plan compile, codegen, file-index fill), then N timed passes; the
artifact records best / median / spread per query so a noisy host is
VISIBLE in the numbers instead of masquerading as a plan regression.
Totals are reported on medians (the stable headline) and bests. Run on
an idle host — never concurrently with another Spark workload.

Usage: python tools/tpch_power.py [--repeat N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquetranger_spark.queries import QUERIES, load_all  # noqa: E402
from parquetranger_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ORDER = [
    "sql_q1_pricing", "sql_q2_min_cost_supplier", "sql_q3_top_orders",
    "sql_q4_priority_check", "sql_q5_local_supplier", "sql_q6_forecast_revenue",
    "sql_q7_nation_volume", "sql_q8_market_share", "sql_q9_product_profit",
    "sql_q10_returned_revenue", "sql_q11_important_stock",
    "sql_q12_priority_by_flag", "sql_q13_order_distribution",
    "sql_q14_promo_share", "sql_q15_top_supplier", "sql_q16_supplier_parts",
    "sql_q17_small_qty_revenue", "sql_q18_big_orders",
    "sql_q19_disjunctive_revenue", "sql_q20_dominant_supplier",
    "sql_q21_waiting_suppliers", "sql_q22_idle_customers",
]


def main() -> None:
    load_all()
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--repeat", type=int, default=3)
    repeat = ap.parse_args().repeat
    spark = get_spark("tpch-power")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("select count(*) from range(1000000)").collect()  # warm
    import statistics

    def cleanup():
        # same isolation as bench.run_one: q11/q15 localCheckpoint a
        # reused aggregate per run — without an unpersist the leaked
        # blocks pile old-gen pressure onto every LATER timed query
        spark.catalog.clearCache()
        for r in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            r.unpersist(False)
        spark.sparkContext._jvm.System.gc()

    stats = {}
    for name in ORDER:
        # untimed warm pass: plan compile + codegen + file index
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cleanup()
        samples = []
        for _ in range(repeat):
            t0 = time.monotonic()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.monotonic() - t0)
            cleanup()
        stats[name] = {
            "best": round(min(samples), 3),
            "median": round(statistics.median(samples), 3),
            "spread": round(max(samples) - min(samples), 3),
        }
        print(f"# {name}: {stats[name]}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "tpch_power_total",
                "value": round(sum(s["median"] for s in stats.values()), 3),
                "total_best": round(sum(s["best"] for s in stats.values()), 3),
                "unit": "sec",
                "repeat": repeat,
                "queries": stats,
                "sf_dir": SF_DIR,
                "n_queries": len(ORDER),
                "protocol": "untimed warm pass per query, then N timed; "
                "median/best/spread recorded; idle host required",
            }
        )
    )


if __name__ == "__main__":
    main()
