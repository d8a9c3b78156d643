"""Capture .explain('formatted') for declared queries into plans/<dir>/.

    python tools/capture_plans.py <dir-tag> <query> [<query> ...]

Writes plans/<dir-tag>/<query>_<suffix>.txt where suffix comes from
$PQRS_PLAN_SUFFIX (default 'after'). Building a lifecycle query executes
its write/maintain phases (not the final sink) — serialize with other
Spark workloads."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquetranger_spark.queries import QUERIES, load_all  # noqa: E402
from parquetranger_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    load_all()
    tag = sys.argv[1]
    names = sys.argv[2:]
    suffix = os.environ.get("PQRS_PLAN_SUFFIX", "after")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plans")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()
        for r in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            r.unpersist(False)


if __name__ == "__main__":
    main()
