"""Declared queries for the dataflow compute operators (SURVEY.md §2.2)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources.table_repo import TableRepo
from . import query
from .common import dmean_sql, dsum, dsum_sql, load, scratch_dir


@query(
    "groupby_mean",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) / count(*) AS mean_qty,
       {dmean_sql('l_extendedprice', 'mean_price')}
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
)
def groupby_mean(spark, sf_dir):
    """C2: the reference's canonical map_partitions payload —
    groupby(...).mean() (tests/test_parallel.py:97-98) — as a native hash
    aggregate (partial + final, whole-stage codegen)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("mean_qty"),
        (F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("double") / F.count(F.lit(1))).alias(
            "mean_price"
        ),
    )


@query(
    "groupby_count",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
)
def groupby_count(spark, sf_dir):
    """C2: group sizes (reference tests/test_parallel.py:74-76)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "map_partitions_agg",
    oracle="""
SELECT l_returnflag, SUM(l_quantity) / count(*) AS mean_qty, count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
)
def map_partitions_agg(spark, sf_dir):
    """C1: per-partition pandas apply (reference map_partitions,
    core.py:138-151) — groupBy(partition col).applyInPandas. The pandas
    body is the reference's own test payload (mean + size)."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    t = TableRepo(scratch_dir("mpart") + "/li", group_cols="l_returnflag", spark=spark)
    t.extend(li)

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "mean_qty": [pdf["l_quantity"].sum() / len(pdf)],
                "n": [len(pdf)],
            }
        )

    return t.map_partitions(per_group, "l_returnflag string, mean_qty double, n long")


@query(
    "dedup_keep_first",
    oracle=f"""
WITH ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY l_orderkey
    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity,
             l_extendedprice, l_returnflag, l_linestatus
  ) AS rn FROM lineitem
)
SELECT l_returnflag, count(*) AS n, {dsum_sql('l_extendedprice', 'sum_price')}
FROM ranked WHERE rn = 1 GROUP BY l_returnflag
""",
)
def dedup_keep_first(spark, sf_dir):
    """C4: keyed dedup keeping the *first* row per key under an explicit
    order (reference keeps first in frame order, core.py:119; Spark has no
    row order so the order is declared — SURVEY §7.3.2)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_linestatus",
    )
    first = li.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return first.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "sum_price")
    )


@query(
    "filter_semi_join",
    oracle="""
SELECT l_returnflag, count(*) AS n, SUM(l_quantity) AS sum_qty
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
GROUP BY l_returnflag
""",
)
def filter_semi_join(spark, sf_dir):
    """C5: key-set membership as a (broadcast) left-semi join (reference
    index-intersection row selection, core.py:124-128)."""
    li = load(spark, sf_dir, "lineitem")
    keys = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    return (
        li.join(F.broadcast(keys), "l_orderkey", "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("sum_qty"))
    )


@query(
    "sort_by_keys",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
""",
)
def sort_by_keys(spark, sf_dir):
    """C8: global ordering (reference sorts paths/frames for determinism,
    core.py:149,310) — range-partitioned sort + limit; ties broken by the
    unique key so the limit is deterministic."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "events_hourly_agg",
    oracle=f"""
SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
       count(*) AS n, {dsum_sql('value', 'sum_value')}
FROM events GROUP BY 1, 2
""",
)
def events_hourly_agg(spark, sf_dir):
    """X6: tumbling-window event aggregation (epoch-hour buckets — exact
    integer division on epoch nanos, TZ independent). The streaming flavor
    (watermark + window) lives in streaming/; this is the identical batch
    plan."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("hour_bucket", F.expr("ts div 3600000000000"))
        .groupBy("hour_bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
    )


from ..serde import pickle_module_by_value as _pmv  # noqa: E402

_pmv(__name__)


@query(
    "topk_per_group",
    oracle="""
SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice, rk
FROM (
  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (
           PARTITION BY l_returnflag, l_linestatus
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         ) AS rk
  FROM lineitem
)
WHERE rk <= 3
""",
)
def topk_per_group(spark, sf_dir):
    """Per-group top-k (top-3 lineitems by price per (returnflag,
    linestatus)): rank window with a unique-key tie-break. Spark 3.5+
    plans this as WindowGroupLimit — the per-partition top-k is pushed
    below the shuffle, so the exchange carries ≤ k rows per group per map
    partition instead of the whole table; the scale-correct shape for
    "top n per key" at any corpus size."""
    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
    )


@query(
    "events_rollup",
    oracle=f"""
SELECT event_type,
       CASE WHEN GROUPING(hour_bucket) = 1 THEN -1 ELSE hour_bucket END AS hour_bucket,
       count(*) AS n, {dsum_sql('value', 'sum_value')}
FROM (
  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_bucket, value
  FROM events
)
GROUP BY ROLLUP (event_type, hour_bucket)
HAVING GROUPING(event_type) = 0
""",
)
def events_rollup(spark, sf_dir):
    """Hierarchical rollup (event_type → hour): one pass produces the
    leaf cells and the per-type subtotals (Spark expands the grouping
    sets before a single map-side-combined aggregation — no second scan).
    Null grouping levels surface as -1 so the oracle comparison is
    null-safe."""
    ev = load(spark, sf_dir, "events")
    hb = F.expr("ts div 3600000000000").alias("hour_bucket")
    return (
        ev.select("event_type", hb, "value")
        .rollup("event_type", "hour_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", "sum_value"),
            # GROUPING() distinguishes the grand-total row from a genuine
            # NULL event_type group — filtering on isNotNull would silently
            # delete real NULL-key cells along with the total
            F.grouping("event_type").alias("__g_et"),
            F.grouping("hour_bucket").alias("__g_hb"),
        )
        .where(F.col("__g_et") == 0)
        .select(
            "event_type",
            F.when(F.col("__g_hb") == 1, F.lit(-1))
            .otherwise(F.col("hour_bucket"))
            .alias("hour_bucket"),
            "n",
            "sum_value",
        )
    )


@query(
    "events_moving_avg",
    oracle=f"""
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) /
       count(*) OVER w AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
)
def events_moving_avg(spark, sf_dir):
    """Per-user 5-event moving average of `value`: one shuffle by user,
    one sort, one frame — the canonical time-series smoothing shape. The
    sum routes through DECIMAL so the sliding aggregate is bit-identical
    to the oracle, and the frame order carries the unique event_id
    tie-break — the engine sees nanosecond timestamps where the oracle
    sees microseconds, so ordering by timestamp alone would leave
    same-microsecond rows in engine-vs-oracle-divergent frames (see
    queries/__init__ exactness rules)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    us = F.expr("ts div 1000")
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id")).rowsBetween(-4, 0)
    return ev.select(
        "user_id",
        "event_id",
        us.alias("ts_us"),
        (
            F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


_Q1_SQL_BODY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
         AS sum_disc_price,
       count(*) AS count_order
FROM {src}
WHERE l_quantity < 50
GROUP BY l_returnflag, l_linestatus
"""


@query("sql_q1_pricing", oracle=_Q1_SQL_BODY.format(src="lineitem"))
def sql_q1_pricing(spark, sf_dir):
    """SQL surface: the TPC-H-Q1-shaped pricing summary executed as a raw
    ``spark.sql`` string over a registered temp view — the same engine
    path as the DataFrame API (identical Catalyst plan), proving the SQL
    front door works end-to-end. The oracle runs the very same text on
    DuckDB, so this also demonstrates dialect-portable SQL."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("pqrs_lineitem_v")
    return spark.sql(_Q1_SQL_BODY.format(src="pqrs_lineitem_v"))


@query(
    "skewed_salted_agg",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
       MIN(event_id) AS min_eid,
       MAX(event_id) AS max_eid
FROM events GROUP BY event_type
""",
)
def skewed_salted_agg(spark, sf_dir):
    """Skew-resistant aggregation surface (functions/skew.py): events'
    event_type is a handful of hot keys over millions of rows — the shape
    where a plain groupBy funnels each hot key through one reducer. The
    salted two-stage plan spreads each key over 16 salt reducers, then
    merges groups x salts partials. Values route through DECIMAL(28,6) so
    the split-stage sum is exact and associative — hash-identical to the
    oracle's single-stage sum regardless of salt layout."""
    from ..functions.skew import salted_agg
    from .common import DEC

    ev = load(spark, sf_dir, "events").select(
        "event_type", "event_id", F.col("value").cast(DEC).alias("__vdec")
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n": ("count", "*"),
            "total_value": ("sum", "__vdec"),
            "min_eid": ("min", "event_id"),
            "max_eid": ("max", "event_id"),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n",
        F.col("total_value").cast("double").alias("total_value"),
        "min_eid",
        "max_eid",
    )


@query(
    "events_cube",
    oracle=f"""
SELECT CASE WHEN GROUPING(event_type) = 1 THEN '<all>' ELSE event_type END AS event_type,
       CASE WHEN GROUPING(day_bucket) = 1 THEN -1 ELSE day_bucket END AS day_bucket,
       count(*) AS n, {dsum_sql('value', 'sum_value')}
FROM (
  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_bucket, value
  FROM events
)
GROUP BY CUBE (event_type, day_bucket)
""",
)
def events_cube(spark, sf_dir):
    """Full CUBE over (event_type, day): leaf cells, both one-dimension
    margins, and the grand total from ONE aggregation pass — Spark expands
    the four grouping sets before a single map-side-combined hash
    aggregate, so the input is scanned once regardless of how many margins
    the cube adds. GROUPING() markers distinguish the rolled-up levels
    from genuine NULL keys; sentinel values keep the oracle comparison
    null-safe."""
    ev = load(spark, sf_dir, "events")
    db = F.expr("ts div 86400000000000").alias("day_bucket")
    return (
        ev.select("event_type", db, "value")
        .cube("event_type", "day_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", "sum_value"),
            F.grouping("event_type").alias("__g_et"),
            F.grouping("day_bucket").alias("__g_db"),
        )
        .select(
            F.when(F.col("__g_et") == 1, F.lit("<all>"))
            .otherwise(F.col("event_type"))
            .alias("event_type"),
            F.when(F.col("__g_db") == 1, F.lit(-1))
            .otherwise(F.col("day_bucket"))
            .alias("day_bucket"),
            "n",
            "sum_value",
        )
    )


# pivot needs the value list up front: passing it skips the extra
# distinct-scan job Spark otherwise runs to discover the columns — at
# 100 TB that discovery pass costs a full shuffle of the pivot key
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_event_types",
    oracle=f"""
SELECT user_id,
       {', '.join(f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}" for t in _EVENT_TYPES)}
FROM events GROUP BY user_id
""",
)
def pivot_event_types(spark, sf_dir):
    """Relational pivot: per-user event counts fanned into one column per
    event type — a single hash aggregate on user_id (the pivot turns into
    count(CASE...) expressions, no extra shuffle). Missing cells surface
    as 0 to match the oracle's COUNT semantics."""
    ev = load(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).agg(F.count(F.lit(1)))
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES],
    )


@query(
    "pivot_unpivot_roundtrip",
    oracle="""
SELECT event_type, count(*) AS n FROM events GROUP BY event_type
""",
)
def pivot_unpivot_roundtrip(spark, sf_dir):
    """Pivot → unpivot round trip: the per-user wide frame melts back to
    (user_id, event_type, n) via ``unpivot`` (Spark's native melt) and
    re-aggregates to the original per-type totals — pinning that the two
    reshapes are exact inverses on the non-null surface."""
    ev = load(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).agg(F.count(F.lit(1)))
    long = wide.unpivot("user_id", _EVENT_TYPES, "event_type", "n_user")
    return (
        long.where(F.col("n_user").isNotNull())
        .groupBy("event_type")
        .agg(F.sum("n_user").alias("n"))
    )


_Q3_SQL = """
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
         AS revenue,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'
GROUP BY l.l_orderkey, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@query("sql_q3_top_orders", oracle=_Q3_SQL)
def sql_q3_top_orders(spark, sf_dir):
    """TPC-H-Q3-shaped multi-join: filtered customer dim (≈1/5 of an
    already-small table) broadcast into orders, the survivors shuffled
    onto lineitem on the join key, one hash aggregate, global top-10 by
    revenue (TakeOrderedAndProject — each partition contributes its local
    top-10, never a full sort). The revenue tie-break is the unique order
    key so the limit is deterministic."""
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    li = load(spark, sf_dir, "lineitem")
    joined = (
        F.broadcast(cust.select("c_custkey"))
        .join(orders.select("o_custkey", "o_orderkey", "o_orderpriority"),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(li.select("l_orderkey", "l_extendedprice", "l_discount"),
              F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        joined.groupBy("l_orderkey", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderpriority")
    )


@query(
    "events_dim_join_agg",
    oracle=f"""
SELECT c.c_mktsegment, count(*) AS n, {dsum_sql('e.value', 'sum_value')}
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def events_dim_join_agg(spark, sf_dir):
    """Fact-to-dimension enrichment: the big skewed fact stream joins a
    small dim with an explicit broadcast — zero shuffle of the fact side;
    the only exchange is the 5-row aggregate. The shape every event
    pipeline runs constantly, and the one where forgetting the broadcast
    costs a full fact shuffle at 100 TB."""
    ev = load(spark, sf_dir, "events").select("user_id", "value")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
    )


@query(
    "sql_q18_big_orders",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey, o.o_totalprice
HAVING SUM(CAST(l.l_quantity AS DECIMAL(28,6))) > 150
""",
)
def sql_q18_big_orders(spark, sf_dir):
    """TPC-H-Q18-shaped large-volume-order filter: join orders to
    lineitem on the order key, aggregate quantities, keep orders above a
    threshold. The HAVING comparison runs on the DECIMAL sum (exact, so
    the engine and oracle keep identical rows at the boundary); the join
    and the aggregation share the l_orderkey hash partitioning, so the
    agg adds no second shuffle."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    agg = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("__qty"))
        .where(F.col("__qty") > 150)
    )
    return agg.select(
        "o_orderkey", "o_totalprice", F.col("__qty").cast("double").alias("total_qty")
    )


@query(
    "user_value_quartiles",
    oracle="""
WITH per_user AS (
  SELECT user_id, SUM(CAST(value AS DECIMAL(28,6))) AS total_dec
  FROM events GROUP BY user_id
),
tiled AS (
  SELECT user_id, total_dec,
         NTILE(4) OVER (ORDER BY total_dec DESC, user_id) AS tile
  FROM per_user
)
SELECT tile, count(*) AS n_users,
       CAST(SUM(total_dec) AS DOUBLE) AS tile_value
FROM tiled GROUP BY tile
""",
)
def user_value_quartiles(spark, sf_dir):
    """Ranking-window coverage: users bucketed into spend quartiles via
    NTILE over the aggregated per-user totals. The global order runs on
    the POST-aggregation frame (one row per user) — never a global sort
    of raw events; the DECIMAL total plus user_id tie-break keeps the
    tile assignment engine-independent at exact-value boundaries."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(28,6)")).alias("total_dec")
    )
    w = Window.orderBy(F.col("total_dec").desc(), "user_id")
    return (
        per_user.withColumn("tile", F.ntile(4).over(w).cast("long"))
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("total_dec").cast("double").alias("tile_value"),
        )
    )


@query(
    "events_props_extract",
    oracle=f"""
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       count(*) AS n
FROM events GROUP BY event_type
""",
)
def events_props_extract(spark, sf_dir):
    """Semi-structured column handling: the events table's ``props`` JSON
    string parsed in place (``get_json_object`` — JVM-side JSON path, no
    Python) and aggregated per type. The parse happens inside the scan
    stage's codegen; at 100 TB the right evolution is shredding the hot
    keys to columns at ingest (sources/ingestor.py), with this as the
    long-tail access path."""
    ev = load(spark, sf_dir, "events")
    # one from_json parse per row, not one get_json_object per aggregate
    parsed = ev.select(
        "event_type", F.from_json(F.col("props"), "k bigint").getField("k").alias("__k")
    )
    return parsed.groupBy("event_type").agg(
        F.sum("__k").alias("sum_k"),
        F.max("__k").alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "orders_monthly_revenue",
    oracle="""
SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
       count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM orders
GROUP BY 1
""",
)
def orders_monthly_revenue(spark, sf_dir):
    """Calendar bucketing (vs raw epoch division): orders rolled up by
    civil month via date_trunc — the grouping raw integer division can't
    express (months are irregular). The NTZ order date is pinned to UTC
    (session TZ) so both engines bucket identical instants; months
    surface as epoch micros of the month start."""
    o = load(spark, sf_dir, "orders")
    month = F.unix_micros(
        F.date_trunc("month", F.col("o_orderdate")).cast("timestamp")
    ).alias("month_us")
    return o.groupBy(month).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "revenue"),
    )


@query(
    "skewed_salted_join",
    oracle="""
SELECT event_type, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
""",
)
def skewed_salted_join(spark, sf_dir):
    """Skew-resistant join surface (functions/skew.py::salted_join): the
    fact stream joins its 5-hot-key dimension through an 8-way salt — the
    fact side salts on a row hash, the dim side replicates per salt, so
    each hot key's rows fan over 8 reducers instead of one. The explicit
    fallback for paths AQE's runtime skew-split doesn't cover (streaming
    joins, deliberate pre-partitioning); results are provably identical
    to the unsalted plan, which is what the oracle states."""
    from ..functions.skew import salted_join

    ev = load(spark, sf_dir, "events").select("event_type", "value")
    dim = ev.select("event_type").distinct()
    joined = salted_join(ev, dim, ["event_type"], n_salts=8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
    )


@query(
    "sql_q5_local_supplier",
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
         AS revenue,
       count(*) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def sql_q5_local_supplier(spark, sf_dir):
    """TPC-H-Q5-shaped six-table join: local-supplier revenue per Asian
    nation. The dims (region→nation→supplier, customer) broadcast down
    the tree, so the only real shuffle is orders⋈lineitem on the order
    key — the plan a 1000-executor cluster wants: one big-side exchange
    no matter how many dimensions the query touches. Catalyst handles the
    join ordering; the region filter prunes through two broadcast hops
    before any fact data moves."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nations = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select("n_nationkey", "n_name")
    supp_in = supp.join(
        F.broadcast(nations), supp.s_nationkey == nations.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            F.broadcast(supp_in),
            (li.l_suppkey == supp_in.s_suppkey)
            & (F.col("c_nationkey") == supp_in.s_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "sql_q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       count(*) AS n
FROM lineitem
WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
)
def sql_q6_forecast_revenue(spark, sf_dir):
    """TPC-H-Q6-shaped scan-heavy filter aggregate: both range predicates
    reach the parquet scan as PushedFilters and the read schema prunes to
    three columns, so the job is one codegen stage over row-group-skipped
    input — the query shape that measures pure scan efficiency."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "events_zscore_outliers",
    oracle="""
WITH stats AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS mu,
         CAST(SUM(CAST(value AS DECIMAL(28,6)) * CAST(value AS DECIMAL(28,6))) AS DOUBLE)
           / count(*) AS m2,
         count(*) AS n
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(SUM(CASE WHEN abs((e.value - s.mu) / sqrt(s.m2 - s.mu * s.mu)) > 3.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       s.n
FROM events e JOIN stats s USING (event_type)
GROUP BY e.event_type, s.n
""",
)
def events_zscore_outliers(spark, sf_dir):
    """Statistical profiling: per-type 3-sigma outlier counts. The
    moments route through DECIMAL sums (exact, associative) and collapse
    to doubles in one division each; sqrt and the z division are IEEE
    correctly-rounded, so the outlier set is bit-identical across
    engines. Two passes — a tiny per-type stats aggregate broadcast back
    onto the stream — because a single-pass exact variance would need
    the same decimal sums anyway."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    dec = F.col("value").cast("decimal(28,6)")
    stats = ev.groupBy("event_type").agg(
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("mu"),
        (F.sum(dec * dec).cast("double") / F.count(F.lit(1))).alias("m2"),
        F.count(F.lit(1)).alias("n"),
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.sqrt(F.col("m2") - F.col("mu") * F.col("mu")))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "n")
        .agg(F.sum((z > 3.0).cast("long")).alias("n_outliers"))
        .select("event_type", "n_outliers", "n")
    )


@query(
    "value_histogram",
    oracle="""
WITH b AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events
)
SELECT CAST(LEAST(19, CAST(floor((e.value - b.lo) / ((b.hi - b.lo) / 20.0)) AS BIGINT))
            AS BIGINT) AS bin,
       count(*) AS n
FROM events e, b
GROUP BY 1
""",
)
def value_histogram(spark, sf_dir):
    """Fixed-bin histogram over the value column: global min/max from one
    tiny aggregate (broadcast as a 1-row cross join — never a driver
    collect in the plan), then a pure floor expression buckets every row
    in the scan stage. Bin edges are the same double arithmetic in both
    engines, so boundary rows bucket identically."""
    ev = load(spark, sf_dir, "events").select("value")
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.crossJoin(F.broadcast(b)).select(
        F.least(
            F.lit(19),
            F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 20.0)),
        )
        .cast("long")
        .alias("bin")
    )
    return binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))


@query(
    "sql_q14_promo_share",
    oracle="""
SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))
                     ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
         AS total_revenue,
       count(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
""",
)
def sql_q14_promo_share(spark, sf_dir):
    """TPC-H-Q14-shaped promo revenue share: lineitem joins the part dim
    (broadcast — the dim is ~1/7 the fact row count and a fraction of
    the bytes) and conditional DECIMAL sums split promo from total in
    the same single aggregation pass. Covers the last otherwise-unused
    base table (part)."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    zero = F.lit(0).cast("decimal(28,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "events_retention_cohorts",
    oracle="""
WITH fu AS (
  SELECT user_id, min(epoch_ns(ts) // 604800000000000) AS cohort_w
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS w FROM events
)
SELECT f.cohort_w, a.w - f.cohort_w AS week_offset, count(*) AS n_users
FROM act a JOIN fu f USING (user_id)
GROUP BY 1, 2
""",
)
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention: users bucketed by first-activity week, distinct
    active users counted per (cohort, week offset) — the canonical
    product-analytics triangle. Two aggregations and one join, all keyed
    on user_id, so the cohort assignment and the activity dedup reuse a
    single hash partitioning; integer week buckets keep the surface
    engine-exact."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 604800000000000").alias("w")
    )
    fu = ev.groupBy("user_id").agg(F.min("w").alias("cohort_w"))
    act = ev.distinct()
    return (
        act.join(fu, "user_id")
        .groupBy("cohort_w", (F.col("w") - F.col("cohort_w")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "shipping_lag_by_priority",
    oracle="""
SELECT o.o_orderpriority,
       count(*) AS n,
       CAST(SUM(CAST((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000
                     AS BIGINT)) AS BIGINT) AS sum_lag_days,
       CAST(MAX((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000)
            AS BIGINT) AS max_lag_days
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""",
)
def shipping_lag_by_priority(spark, sf_dir):
    """Order-to-ship lag per priority: the order/lineitem timestamps
    difference floored to whole days — integer arithmetic end to end, so
    the lag distribution is engine-exact. Same single-exchange shape as
    Q18 (grouping on the dim column after the orderkey join reuses no
    partitioning, but the join output is small relative to the scan)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("__o_us")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("__s_us")
    )
    lag = F.expr("(__s_us - __o_us) div 86400000000")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_orderpriority", lag.alias("__lag"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__lag").alias("sum_lag_days"),
            F.max("__lag").alias("max_lag_days"),
        )
    )


@query(
    "events_props_variant",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       count(*) AS n
FROM events GROUP BY event_type
""",
)
def events_props_variant(spark, sf_dir):
    """Semi-structured storage via Spark 4's VARIANT type: the events
    ``props`` JSON is parsed ONCE at ingest (``parse_json``), persisted
    to parquet as a variant column (binary metadata+value pair — typed,
    no re-tokenizing on read), then queried with ``variant_get`` typed
    path access. This is the storage evolution events_props_extract's
    docstring promises (shred the hot keys; variant carries the long
    tail): at 100 TB the JSON parse cost is paid once at write time,
    and every later scan reads the compact binary encoding. The oracle
    runs json_extract on the ORIGINAL strings, so the parse→write→
    read→extract round trip is value-checked end-to-end."""
    from .common import scratch_dir

    root = scratch_dir("variant")
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.parse_json(F.col("props")).alias("props_v")
    )
    ev.write.mode("overwrite").parquet(f"{root}/t")
    back = spark.read.parquet(f"{root}/t")
    return back.groupBy("event_type").agg(
        F.sum(F.variant_get("props_v", "$.k", "bigint")).alias("sum_k"),
        F.max(F.variant_get("props_v", "$.k", "bigint")).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "events_trailing_hour_sum",
    oracle="""
WITH t AS (
  SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_s,
         CAST(value AS DECIMAL(28,6)) AS v
  FROM events WHERE user_id < 200
)
SELECT user_id, ts_s,
       CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts_s
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS trailing_1h,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts_s
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_1h
FROM t
""",
)
def events_trailing_hour_sum(spark, sf_dir):
    """C13 (RANGE flavor): per-user trailing-one-hour sums with a RANGE
    window frame — the frame boundary is a VALUE offset on the ordering
    key (3600 s), not a row count, which is the correct semantics for
    irregularly-spaced events (a ROWS frame silently changes meaning
    with event density). Decimal-routed sums keep the running values
    exact; integer epoch-seconds ordering keeps the frame boundaries
    engine-identical. Same one-shuffle shape as any per-key window."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").where(F.col("user_id") < 200).select(
        "user_id",
        F.expr("ts div 1000000000").alias("ts_s"),
        F.col("value").cast("decimal(28,6)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "ts_s",
        F.sum("v").over(w).cast("double").alias("trailing_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@query(
    "ps_groupby_mean",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) /
         count(*) AS avg_qty,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
)
def ps_groupby_mean(spark, sf_dir):
    """C2 via the pandas API on Spark (`pyspark.pandas`) — the migration
    path for the reference's users, whose entire compute layer is pandas
    idioms on `get_full_df()` output (SURVEY §1): the same
    `df.groupby(...).agg(...)` spelling runs distributed, planned by
    Catalyst, and converts losslessly to a DataFrame. The decimal-routed
    mean keeps the surface engine-exact (ps `.mean()` would sum doubles
    in partition order); the point is the API, not a new operator."""
    import pyspark.pandas as ps

    psdf = ps.DataFrame(
        load(spark, sf_dir, "lineitem").select(
            "l_returnflag", F.col("l_quantity").cast("decimal(28,6)").alias("q")
        )
    )
    g = psdf.groupby("l_returnflag").agg(q=("q", "sum"), n=("q", "count"))
    out = g.reset_index().to_spark()
    return out.select(
        "l_returnflag",
        (F.col("q").cast("double") / F.col("n")).alias("avg_qty"),
        F.col("n").cast("long").alias("n"),
    )


@query(
    "events_gap_fill",
    oracle="""
WITH counts AS (
  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h, count(*) AS n
  FROM events GROUP BY 1, 2
),
b AS (SELECT min(epoch_ns(ts) // 3600000000000) AS mn,
             max(epoch_ns(ts) // 3600000000000) AS mx FROM events),
spine AS (
  SELECT t.event_type, u.h
  FROM (SELECT DISTINCT event_type FROM events) t, b,
       UNNEST(generate_series(b.mn, b.mx)) AS u(h)
)
SELECT s.event_type, s.h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
       CAST(SUM(COALESCE(c.n, 0)) OVER (
         PARTITION BY s.event_type ORDER BY s.h) AS BIGINT) AS cum_n
FROM spine s LEFT JOIN counts c ON s.event_type = c.event_type AND s.h = c.h
""",
)
def events_gap_fill(spark, sf_dir):
    """Time-series gap filling: a dense hourly spine per event type
    (sequence + explode over the observed range — spine size is
    types × hours, metadata-sized, generated rather than shuffled), LEFT
    joined to the hourly counts so silent hours surface as explicit
    zeros, with a per-type running total over the dense axis. This is
    the resample step every monitoring/feature pipeline needs before
    window math — a sparse frame would silently skip empty periods. One
    aggregation + one broadcast-spine join + one per-type window."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.expr("ts div 3600000000000").alias("h")
    )
    counts = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("n"))
    b = ev.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(b))
        .select("event_type", F.explode(F.sequence("mn", "mx")).alias("h"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    return (
        spine.join(counts, ["event_type", "h"], "left")
        .select("event_type", "h", F.coalesce("n", F.lit(0)).alias("n"))
        .withColumn("cum_n", F.sum("n").over(w))
    )


@query(
    "events_mad_outliers",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, abs(e.value - m.med) AS dv, m.med
  FROM events e JOIN med m USING (event_type)
),
mad AS (SELECT event_type, quantile_cont(dv, 0.5) AS mad FROM dev GROUP BY 1)
SELECT d.event_type, count(*) AS n,
       CAST(count(CASE WHEN d.dv > 3.0 * m.mad THEN 1 END) AS BIGINT)
         AS n_outliers,
       min(d.med) AS med, min(m.mad) AS mad
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1
""",
)
def events_mad_outliers(spark, sf_dir):
    """Robust anomaly detection: per-type outlier counts by MEDIAN
    ABSOLUTE DEVIATION (|v − median| > 3·MAD) — the robust twin of the
    3-sigma z-score query (one extreme value cannot drag the threshold
    the way it drags a mean/stddev). Exact medians interpolate
    identically in both engines (verified bit-exact), so the whole
    surface is deterministic. Cost shape: two order-statistic passes
    (median, then MAD of deviations) + one counting pass, each a
    map-side-combined aggregate with the tiny per-type medians broadcast
    back — never a global sort."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("dv"), "med"
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(dv, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("dv") > F.lit(3.0) * F.col("mad"), 1)).alias(
                "n_outliers"
            ),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
        )
    )


@query(
    "customer_retention_setops",
    oracle="""
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
y97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
retained AS (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97),
churned AS (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
SELECT c.c_mktsegment,
       count(CASE WHEN r.o_custkey IS NOT NULL THEN 1 END) AS n_retained,
       count(CASE WHEN ch.o_custkey IS NOT NULL THEN 1 END) AS n_churned
FROM customer c
LEFT JOIN retained r ON c.c_custkey = r.o_custkey
LEFT JOIN churned ch ON c.c_custkey = ch.o_custkey
GROUP BY c.c_mktsegment
""",
)
def customer_retention_setops(spark, sf_dir):
    """Set-operation analytics: customers active in BOTH 1996 and 1997
    (INTERSECT) vs active in 1996 only (EXCEPT), rolled up per segment.
    Catalyst plans INTERSECT as a left-semi and EXCEPT as a left-anti
    hash join over the deduplicated key sets — no sort-based set
    algebra; the year filters push to the orders scan and the two key
    sets reuse one distinct pass each. The segment rollup joins against
    the (customer-count-sized) result sets."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", F.year(F.col("o_orderdate").cast("timestamp")).alias("y")
    )
    y96 = orders.where(F.col("y") == 1996).select("o_custkey").distinct()
    y97 = orders.where(F.col("y") == 1997).select("o_custkey").distinct()
    retained = y96.intersect(y97).withColumnRenamed("o_custkey", "r_key")
    churned = y96.exceptAll(y97).withColumnRenamed("o_custkey", "c_key")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        cust.join(retained, cust.c_custkey == F.col("r_key"), "left")
        .join(churned, cust.c_custkey == F.col("c_key"), "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("r_key").alias("n_retained"),
            F.count("c_key").alias("n_churned"),
        )
    )


@query(
    "user_activity_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS d FROM events
),
isl AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, count(*) AS len FROM isl GROUP BY user_id, grp
)
SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
       count(*) AS n_streaks
FROM streaks GROUP BY user_id
""",
)
def user_activity_streaks(spark, sf_dir):
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    days — the classic islands construction (day − row_number is
    constant within a consecutive run, so one per-user window + one
    group-by finds every island; no self-join, no recursion). Distinct
    day buckets first, so the window sorts user-day rows, not raw
    events; integer day arithmetic keeps the surface engine-exact."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 86400000000000").alias("d")
    )
    days = ev.distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    streaks = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@query(
    "event_transition_matrix",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_ns(ts), event_id) AS prev
  FROM events
)
SELECT prev, event_type AS next, count(*) AS n
FROM s WHERE prev IS NOT NULL
GROUP BY prev, event_type
""",
)
def event_transition_matrix(spark, sf_dir):
    """Sequence analytics: the per-user event-type TRANSITION MATRIX
    (what follows what) — the empirical bigram model behaviour-modeling
    and funnel-design read from. One per-user lag window (event_id
    tie-break makes simultaneous events deterministic) + one count
    aggregation; the matrix is |types|² rows regardless of stream
    size."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.withColumn("prev", F.lag("event_type").over(w))
    return (
        s.where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE rev AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
         count(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue
  FROM {src} GROUP BY 1
),
bounds AS (SELECT min(ym) AS lo, max(ym) AS hi FROM rev),
spine(ym, hi) AS (
  SELECT lo, hi FROM bounds
  UNION ALL
  SELECT ym + 1, hi FROM spine WHERE ym < hi
)
SELECT s.ym, COALESCE(r.n_orders, 0) AS n_orders,
       COALESCE(r.revenue, CAST(0 AS DOUBLE)) AS revenue
FROM spine s LEFT JOIN rev r ON s.ym = r.ym
"""


@query("sql_recursive_spine", oracle=_RECURSIVE_SPINE_SQL.format(src="orders"))
def sql_recursive_spine(spark, sf_dir):
    """SQL surface, Spark 4 recursive CTE: a month spine generated by
    WITH RECURSIVE (anchor = first order month, step = +1 month up to the
    last) left-joined to monthly revenue, so months with zero orders
    surface explicitly — the gap-filling shape `events_gap_fill` builds
    with `sequence()`, here expressed through the recursive-union
    iteration the SQL front door now supports. The IDENTICAL text runs on
    DuckDB (dialect-portable: integer year*12+month spine, no
    engine-specific date arithmetic); the recursion is bounded by the
    calendar span (~80 rounds), far under Spark's recursion limit, and
    each step is a constant-size row — driver-safe at any fact-table
    scale because the recursion runs over the month AGGREGATE, never the
    facts."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("pqrs_orders_rec_v")
    return spark.sql(_RECURSIVE_SPINE_SQL.format(src="pqrs_orders_rec_v"))


@query(
    "ab_test_lift",
    oracle="""
WITH t AS (
  SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS arm,
         CAST(value AS DECIMAL(28,6)) AS v
  FROM events WHERE event_type = 'purchase'
),
agg AS (
  SELECT SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
         CAST(SUM(CASE WHEN arm = 0 THEN v END) AS DOUBLE) AS s_a,
         CAST(SUM(CASE WHEN arm = 1 THEN v END) AS DOUBLE) AS s_b
  FROM t
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       s_a / n_a AS mean_a, s_b / n_b AS mean_b,
       (s_b / n_b) / (s_a / n_a) AS lift
FROM agg
""",
)
def ab_test_lift(spark, sf_dir):
    """Experimentation surface: deterministic A/B assignment by content
    hash (md5-prefix parity of user_id — the same leakage-proof device
    as the dataset split: a user's arm never changes as data grows, and
    any engine re-derives it), then per-arm decimal-exact purchase-value
    means and their lift ratio in ONE conditional-aggregation pass over
    the fact stream — no join, no second scan. The lift is a single
    double division of two exactly-computed means, so the oracle hash
    matches bit-for-bit."""
    from ..functions.hashing import md5_prefix_long
    from .common import DEC

    ev = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    t = ev.select(
        (md5_prefix_long("user_id") % 2).alias("arm"),
        F.col("value").cast(DEC).alias("v"),
    )
    a0, a1 = F.col("arm") == 0, F.col("arm") == 1
    agg = t.agg(
        F.sum(F.when(a0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(a1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(a0, F.col("v"))).cast("double").alias("s_a"),
        F.sum(F.when(a1, F.col("v"))).cast("double").alias("s_b"),
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (F.col("s_a") / F.col("n_a")).alias("mean_a"),
        (F.col("s_b") / F.col("n_b")).alias("mean_b"),
        ((F.col("s_b") / F.col("n_b")) / (F.col("s_a") / F.col("n_a"))).alias("lift"),
    )


@query(
    "events_decayed_engagement",
    oracle="""
WITH ref AS (SELECT max(epoch_ns(ts)) AS tref FROM events),
t AS (
  SELECT user_id,
         (ref.tref - epoch_ns(ts)) // 86400000000000 AS age_days,
         CAST(value AS DECIMAL(28,6)) AS v
  FROM events, ref
)
SELECT user_id, count(*) AS n_events,
       CAST(SUM(v * (CASE WHEN age_days <= 20
                          THEN CAST(power(2, 20 - age_days) AS BIGINT)
                          ELSE 0 END)) AS DOUBLE) / 1048576.0 AS score
FROM t GROUP BY user_id
""",
)
def events_decayed_engagement(spark, sf_dir):
    """Recency-weighted engagement: per-user sum of event values decayed
    by a one-day half-life, computed with EXACT integer weights — the
    decay 0.5^age_days is expressed as the integer 2^(20-age_days)
    (ages past 20 days decay to zero), so the weighted sum is pure
    decimal×bigint arithmetic and only the final /2^20 normalization
    touches doubles: bit-identical across engines where naive
    pow(0.5, Δt/86400.0) would drift on division rounding. age comes
    from integer epoch-nanos division (div), never a double divide of
    ~1e18 nanos. One scan, one tiny max-aggregate for the reference
    instant, one grouped sum."""
    from .common import DEC

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    tref = ev.agg(F.max("ts").alias("m")).first()["m"]
    age = F.expr(f"({tref}L - ts) div 86400000000000")
    w = F.when(age <= 20, F.pow(F.lit(2.0), (F.lit(20) - age).cast("double")).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    t = ev.select(
        "user_id", (F.col("value").cast(DEC) * w).alias("wv")
    )
    return t.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("wv").cast("double") / F.lit(1048576.0)).alias("score"),
    )
