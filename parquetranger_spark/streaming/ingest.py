"""Structured-Streaming surface: the streaming flavor of the reference's
record writers (core.py:458-523) and the event-analytics extension (X6).

The reference's concurrent-append story is per-path locks + last-file
top-up; Spark's answer is micro-batching — a stream lands in the TableRepo
through ``foreachBatch``, each epoch being exactly the same distributed
append/upsert the batch API performs. Watermarked tumbling windows cover
the late-data aggregation case the reference never had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.table_repo import TableRepo


def stream_into_repo(
    stream_df: DataFrame,
    trepo: TableRepo,
    checkpoint: str,
    replace: bool = False,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Sink a streaming DataFrame into a TableRepo via foreachBatch.

    Each micro-batch is one distributed TableRepo write (append, or keyed
    upsert when ``replace``), giving exactly-once table contents under
    Spark's checkpointed epoch tracking.
    """

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if replace:
            trepo.replace_records(batch_df)
        else:
            trepo.extend(batch_df)

    writer = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    value_agg=None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    the streaming twin of queries/compute.py::events_hourly_agg.
    ``value_agg`` overrides the value aggregate (default plain sum)."""
    value_agg = value_agg if value_agg is not None else F.sum("value").alias("sum_value")
    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), value_agg)
    )
    rest = [c for c in agg.columns if c != "window"]
    return agg.select(F.col("window.start").alias("window_start"), *rest)


def stream_stream_interval_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    max_delay_seconds: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left row with
    the same key's right rows whose event time falls in
    ``[left_ts, left_ts + max_delay_seconds]``.

    This is Spark's canonical unbounded-join shape: both sides carry a
    watermark, the time-range predicate bounds how long either side's
    rows stay in the join state, so state size is O(key cardinality ×
    window), not O(stream length) — the property that makes a days-long
    attribution join (view → purchase within an hour) runnable forever.
    Timestamp columns must be TimestampType (cast epoch-nanos longs via
    ``timestamp_micros(ts div 1000)``).
    """
    l = left_stream.withWatermark(left_ts, watermark).alias("l")
    r = right_stream.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay_seconds} SECONDS")
        )
    )
    return l.join(r, cond, "inner")


from contextlib import contextmanager  # noqa: E402


@contextmanager
def state_partitions(spark, n: int):
    """Scope ``spark.sql.shuffle.partitions`` around a streaming query
    START: Structured Streaming pins the stateful-operator partition count
    from this conf at first checkpoint, so it must be set before
    ``.start()`` — this is the per-stream state-sizing knob (state store
    instances = this number). The conf is restored immediately after, so
    nothing leaks into the caller's session (batch plans meanwhile keep
    AQE-coalesced parallelism regardless)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
