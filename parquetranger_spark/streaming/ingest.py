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
