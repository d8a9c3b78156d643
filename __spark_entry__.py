"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquetranger_spark.queries import ORACLES, QUERIES, load_all  # noqa: E402

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: partitioned TableRepo write of lineitem, partition-pruned
    read-back, TPC-H-Q1-shaped aggregate (SURVEY §7.1 M0)."""
    from pyspark.sql import functions as F

    from parquetranger_spark.queries.common import dsum, load, scratch_dir
    from parquetranger_spark.sources.table_repo import TableRepo

    li = load(spark, "/root/testdata/sf0.001", "lineitem")
    t = TableRepo(scratch_dir("entry") + "/lineitem", group_cols="l_returnflag", spark=spark)
    t.extend(li)
    return (
        t.get_full_df()
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
