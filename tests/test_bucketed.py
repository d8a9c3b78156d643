"""BucketedRepo: the no-shuffle co-located join property, round-trips,
and append behavior."""

import pandas as pd
from pyspark.sql import functions as F

from parquetranger_spark.sources.bucketed import BucketedRepo


def _repos(spark, tmp_root, n=8):
    left = BucketedRepo(f"{tmp_root}/l", "k", n, spark=spark)
    right = BucketedRepo(f"{tmp_root}/r", "k", n, spark=spark)
    left.replace_all(
        spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    )
    right.replace_all(
        spark.range(0, 1000, 3).select(F.col("id").alias("k"), (F.col("id") + 7).alias("b"))
    )
    return left, right


def _no_broadcast(spark):
    """Force the non-broadcast path: the no-shuffle property matters for
    BIG-big joins, where neither side broadcasts."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    return ctx()


def test_bucketed_join_has_no_shuffle(spark, tmp_root):
    left, right = _repos(spark, tmp_root)
    with _no_broadcast(spark):
        joined = left.get_full_df().join(right.get_full_df(), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 334
    left.purge(), right.purge()


def test_bucketed_append_keeps_property(spark, tmp_root):
    left, right = _repos(spark, tmp_root)
    left.extend(
        spark.range(1000, 1200).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    )
    with _no_broadcast(spark):
        joined = left.get_full_df().join(right.get_full_df(), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert left.get_full_df().count() == 1200
    left.purge(), right.purge()


def test_bucketed_groupby_on_key_has_no_exchange(spark, tmp_root):
    left, _ = _repos(spark, tmp_root)
    agg = left.get_full_df().groupBy("k").agg(F.sum("a").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.count() == 1000
    left.purge()


def test_purge_drops_table_and_files(spark, tmp_root):
    left, right = _repos(spark, tmp_root)
    name = left.table_name
    left.purge(), right.purge()
    assert not spark.catalog.tableExists(name)
    import os

    assert not os.path.exists(f"{tmp_root}/l")


def test_reregistration_after_catalog_loss(spark, tmp_root):
    """A fresh session's empty catalog must not orphan on-disk bucketed
    tables: get_full_df re-registers from the path (CREATE TABLE ...
    CLUSTERED BY) and the no-shuffle join property survives."""
    left, right = _repos(spark, tmp_root)
    # simulate a new session: drop the catalog entries (external tables —
    # files stay on disk)
    spark.sql(f"DROP TABLE {left.table_name}")
    spark.sql(f"DROP TABLE {right.table_name}")
    with _no_broadcast(spark):
        joined = left.get_full_df().join(right.get_full_df(), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 334
    left.purge(), right.purge()


def test_bucketed_agg_plans_without_exchange(spark, sf_dir):
    """Grouping a bucketed table on its bucket key must not shuffle —
    the scan's bucketing satisfies the aggregate's distribution."""
    from parquetranger_spark.queries.storage import bucketed_agg_noshuffle
    from tests.test_plans import plan

    p = plan(bucketed_agg_noshuffle(spark, sf_dir), "simple")
    assert "Exchange" not in p, p
