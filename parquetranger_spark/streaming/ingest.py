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
    exactly_once: bool = False,
) -> StreamingQuery:
    """Sink a streaming DataFrame into a TableRepo via foreachBatch.

    Each micro-batch is one distributed TableRepo write (append, or keyed
    upsert when ``replace``). Upserts are idempotent under batch replay
    (exactly-once contents); plain appends are at-least-once — unless
    ``exactly_once=True`` on a manifest-mode repo, which fences every
    append with (stream id, epoch) inside the atomic manifest CAS so a
    replayed batch is a no-op (``TableRepo.extend_fenced``).
    """
    if exactly_once and trepo.commit_mode != "manifest":
        raise TypeError("exactly_once appends need commit_mode='manifest'")
    sid: dict[str, str | None] = {"v": None}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if replace:
            trepo.replace_records(batch_df)
        elif exactly_once:
            if sid["v"] is None:
                # fallback: a checkpoint-path-derived id, NOT a constant — a
                # constant would make unrelated streams (or a failed
                # metadata read) collide on fence (id, epoch) and silently
                # drop real batches as replays. The checkpoint path is
                # unique per stream and stable across restarts.
                sid["v"] = _stream_id(checkpoint) or _ckpt_id(checkpoint)
            trepo.extend_fenced(batch_df, fence=(sid["v"], epoch_id))
        else:
            trepo.extend(batch_df)

    # Delivery contract under crash replay: foreachBatch re-runs a batch
    # whose writes finished but whose checkpoint commit didn't. replace
    # mode is idempotent (re-upserting the same keys is a no-op); extend
    # mode is at-least-once — callers needing strict exactly-once appends
    # should dedup on ingest keys downstream or use the keyed/replace
    # path (incremental_rollup_into_repo shows the epoch-fenced pattern).

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


def incremental_rollup_into_repo(
    stream_df: DataFrame,
    trepo: TableRepo,
    keys: list[str],
    sum_cols: list[str],
    checkpoint: str,
    count_col: str = "n",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Incrementally-maintained materialized aggregate: each micro-batch
    is reduced to a partial aggregate (count + sums per key) and merged
    ADDITIVELY into a TableRepo snapshot — the rollup table is always the
    exact aggregate of everything ingested so far, without ever
    re-scanning history.

    Exactness: ``sum_cols`` must already be DECIMAL (decimal addition is
    associative), so the final state is bit-identical to a one-shot batch
    aggregate regardless of how the stream was micro-batched.

    Scale shape: the per-batch merge touches only the partitions whose
    group values appear in the batch (partition-pruned read +
    ``replace_groups`` dynamic overwrite), so the cost per epoch is
    O(batch + touched partitions) — not O(table). The repo must be
    grouped by the first key. The driver-side collect is of distinct
    partition values only (bounded by partition cardinality, never rows).
    """
    gc = trepo.group_cols[0]
    assert gc == keys[0], "repo must be grouped by the first rollup key"
    sid: dict[str, str | None] = {"v": None}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if sid["v"] is None:
            # the checkpoint's stable query id (written at start()) scopes
            # the epoch fence: a FRESH checkpoint restarts epoch_id at 0,
            # and fencing on the bare epoch would mark every existing
            # partition "done" and silently drop all new data. Fallback is
            # a checkpoint-path-derived id, never a constant (see
            # stream_into_repo's sink for why).
            sid["v"] = _stream_id(checkpoint) or _ckpt_id(checkpoint)
        merge_rollup_batch(
            trepo, batch_df, keys, sum_cols, epoch_id, count_col, stream_id=sid["v"]
        )

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _ckpt_id(checkpoint: str) -> str:
    import hashlib

    return "ckpt-" + hashlib.md5(checkpoint.encode()).hexdigest()[:16]


_EPOCH_COL = "__pqr_epoch"
_SID_COL = "__pqr_stream"


def _stream_id(checkpoint: str) -> str | None:
    """The StreamingQuery's stable id from ``<checkpoint>/metadata`` —
    constant across restarts of the same checkpoint, different for a
    fresh one."""
    import json

    from ..sources import fs as _fs

    try:
        fs = _fs.fs_for(checkpoint)
        return json.loads(fs.read_text(_fs.join_path(checkpoint, "metadata")))["id"]
    except Exception:
        return None


def merge_rollup_batch(
    trepo: TableRepo,
    batch_df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    epoch_id: int,
    count_col: str = "n",
    stream_id: str | None = None,
) -> None:
    """One epoch's additive merge, idempotent under foreachBatch replay.

    Every rollup partition carries a (stream id, high-water epoch) fence
    written in the SAME dynamic-overwrite that writes the merged data —
    per partition, data and fence commit together. On replay of epoch N,
    partitions whose stored fence is already ≥ N for THIS stream
    incarnation merged the batch before the crash and are skipped;
    partitions still below N merge normally — each batch lands exactly
    once per partition, the unit at which the storage layer is atomic.
    A different ``stream_id`` (fresh checkpoint over an existing table)
    never fences: its epochs restart at 0, and the handoff boundary is
    the usual at-least-once caveat of replacing a checkpoint mid-flight.

    ``stream_id`` is REQUIRED: a shared default would make unrelated
    pipelines writing one table collide on fence (id, epoch) and
    silently drop each other's batches as replays.

    Crash-atomicity of the data+fence commit is per partition overwrite:
    EXACT in manifest mode (one atomic manifest flip) — prefer
    ``commit_mode='manifest'`` for rollup targets; in files mode Spark's
    dynamic overwrite is delete-then-rename, so a driver crash inside
    the overwrite itself can leave a touched partition torn (the usual
    files-mode caveat, absent on a manifest repo).
    """
    if not stream_id:
        raise ValueError(
            "merge_rollup_batch needs an explicit stream_id (unique per "
            "pipeline — e.g. the checkpoint's stream id); a shared default "
            "would fence away other pipelines' batches as replays"
        )
    gc = trepo.group_cols[0]
    partial = batch_df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(F.col(c)).alias(c) for c in sum_cols],
    )
    # materialize once: the partial backs the touched-value collect AND
    # the merge union, and it is tiny (one row per touched key)
    partial = partial.localCheckpoint(eager=True)
    touched = [r[0] for r in partial.select(gc).distinct().collect()]
    if trepo.commit_mode == "manifest":
        nonempty = bool(trepo.paths)  # one small manifest JSON read
    else:
        # cheap early-exit probe, not a full recursive listing per epoch
        nonempty = trepo._fs().has_any_file(trepo.main_path, ".parquet")
    if nonempty:
        existing = trepo.get_full_df().where(F.col(gc).isin(touched))
        if _SID_COL not in existing.columns or _EPOCH_COL not in existing.columns:
            # a fence-less pre-existing table (seeded by a plain batch
            # write) cannot record idempotence state — and the default
            # schema alignment would silently DROP the fence columns on
            # write-back, losing replay protection without any error.
            # Fail loudly instead of degrading silently.
            raise TypeError(
                f"rollup table {trepo.name} has no fence columns "
                f"({_SID_COL}, {_EPOCH_COL}); seed incremental rollups "
                "through merge_rollup_batch itself (first epoch creates "
                "them) or recreate the table with the fence columns"
            )
        # same double-use: fence probe + merge read the touched partitions
        existing = existing.localCheckpoint(eager=True)
        done = {
            r[0]
            for r in existing.where(F.col(_SID_COL) == stream_id)
            .groupBy(gc)
            .agg(F.max(_EPOCH_COL).alias("__e"))
            .where(F.col("__e") >= epoch_id)
            .select(gc)
            .collect()
        }
        if done:
            partial = partial.where(~F.col(gc).isin(list(done)))
            existing = existing.where(~F.col(gc).isin(list(done)))
            if len(done) == len(touched):
                return
        merged = (
            existing.drop(_EPOCH_COL, _SID_COL)
            .unionByName(partial)
            .groupBy(*keys)
            .agg(
                F.sum(F.col(count_col)).alias(count_col),
                *[F.sum(F.col(c)).alias(c) for c in sum_cols],
            )
        )
    else:
        merged = partial
    merged = merged.withColumn(_EPOCH_COL, F.lit(int(epoch_id)).cast("long")).withColumn(
        _SID_COL, F.lit(stream_id)
    )
    trepo.replace_groups(merged.localCheckpoint(eager=True))


@contextmanager
def rocksdb_state_store(spark):
    """Scope the RocksDB state-store provider around a streaming query
    start: ``transformWithState`` REQUIRES RocksDB (the default HDFS-backed
    provider cannot host its multiple named state variables / TTL /
    timers). RocksDB is also the provider a 100 TB deployment wants for
    every large-state stream — incremental checkpointing + changelog,
    state spills to local disk instead of executor heap. Scoped, not
    session-global, so the HDFS provider keeps serving the existing
    small-state streams (their checkpoints pin their provider)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
