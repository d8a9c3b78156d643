"""Event-stream analytics (SURVEY §2.4 X6): tumbling buckets (see
queries/compute.py::events_hourly_agg) and gap-based sessionization.

Sessionization is the lag + cumulative-sum-of-gap-flags pattern — two
window passes over (user, time), both partitioned by user so the only
shuffle is one hash partition by user_id. The streaming twin is
``session_window`` (streaming/ingest.py's watermark machinery applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NS_PER_SEC = 1_000_000_000


def sessionize(
    df: DataFrame,
    ts_ns_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a session id per (user, gap>threshold run). ``ts`` is epoch
    nanos (long) — exact integer math, engine-independent."""
    w = Window.partitionBy(user_col).orderBy(ts_ns_col)
    gap = F.col(ts_ns_col) - F.lag(ts_ns_col).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_seconds * NS_PER_SEC), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("__new_s", new_session).withColumn(
        "session_id", F.sum("__new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new_s")


def session_stats(
    df: DataFrame,
    ts_ns_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-user session counts + event counts — the sessionization
    aggregate used by the declared query."""
    s = sessionize(df, ts_ns_col, user_col, gap_seconds)
    return s.groupBy(user_col).agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )
