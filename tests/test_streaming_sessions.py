"""Stateful streaming sessionization (applyInPandasWithState) — state must
carry across micro-batches and the final per-user counts must equal the
batch operator's."""

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parquetranger_spark.operators.events import NS_PER_SEC, session_stats
from parquetranger_spark.queries.common import load
from parquetranger_spark.streaming.sessions import streaming_session_stats


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_streaming_sessions_match_batch(spark, tmp_root):
    src = f"{tmp_root}/src"
    gap = 1800 * NS_PER_SEC
    # two files => two micro-batches (maxFilesPerTrigger=1); user 1 continues
    # a session across the batch boundary, user 2 opens a new one
    b1 = [(1, 10 * gap), (1, 10 * gap + 5), (2, 10 * gap)]
    b2 = [(1, 10 * gap + 10), (2, 13 * gap), (3, 20 * gap)]
    _write_batch(spark, f"{src}/f1", b1)
    time.sleep(1.1)  # FileStreamSource orders batches by modification time
    _write_batch(spark, f"{src}/f2", b2)
    now = time.time()
    for sub, t in [("f1", now - 60), ("f2", now)]:
        for root, _, files in os.walk(f"{src}/{sub}"):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    stream = (
        spark.readStream.schema("user_id long, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = (
        streaming_session_stats(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp_root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.table("sess_out").toPandas()
    # counts are monotone: latest == max per user
    final = out.groupby("user_id").agg({"n_sessions": "max", "n_events": "max"})

    batch_df = spark.createDataFrame(b1 + b2, "user_id long, ts long")
    expected = (
        session_stats(batch_df).toPandas().set_index("user_id").sort_index()
    )
    pd.testing.assert_frame_equal(
        final.sort_index(), expected[["n_sessions", "n_events"]], check_dtype=False
    )
    # state really carried over: user 1's cross-batch events stayed 1 session
    assert final.loc[1, "n_sessions"] == 1 and final.loc[1, "n_events"] == 3
    assert final.loc[2, "n_sessions"] == 2
    # and two distinct micro-batches actually ran (user 1 emitted twice)
    assert len(out[out.user_id == 1]) == 2


def test_tws_profile_matches_batch(spark, sf_dir, tmp_path):
    """streaming_profile_tws must converge to the batch per-user
    aggregate — through transformWithStateInPandas (ValueState +
    MapState) where protobuf exists, or its applyInPandasWithState twin
    (identical state machine and outputs) where it doesn't; either way
    the third stateful operator path runs here, unskipped."""
    import uuid

    from contextlib import nullcontext

    from parquetranger_spark.queries.sketches import _has_protobuf
    from parquetranger_spark.streaming.ingest import (
        rocksdb_state_store,
        state_partitions,
    )
    from parquetranger_spark.streaming.sessions import streaming_profile_tws

    ev = load(spark, sf_dir, "events").select("user_id", "event_type").limit(2000)
    ev.repartition(3).write.mode("overwrite").parquet(f"{tmp_path}/src")
    stream = (
        spark.readStream.schema("user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp_path}/src")
    )
    name = f"tws_{uuid.uuid4().hex[:8]}"
    store = rocksdb_state_store(spark) if _has_protobuf() else nullcontext()
    with state_partitions(spark, 4), store:
        q = (
            streaming_profile_tws(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", f"{tmp_path}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(300)
    got = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("n_types").alias("n_types"))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    src = spark.read.parquet(f"{tmp_path}/src")
    exp = (
        src.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_streaming_session_stats_string_key_and_null_ts(spark, tmp_path):
    """Grouping-key type follows the input schema (string keys work, not
    just long), and a NULL ts row is tolerated instead of wedging the
    stream on int(NaN)."""
    import uuid

    from parquetranger_spark.streaming.sessions import streaming_session_stats

    src = f"{tmp_path}/src"
    spark.createDataFrame(
        [("alice", 1_000_000_000_000), ("alice", 2_000_000_000_000_000),
         ("bob", None), ("bob", 5_000_000_000_000)],
        "user_id string, ts long",
    ).write.parquet(src)
    stream = spark.readStream.schema("user_id string, ts long").parquet(src)
    out = streaming_session_stats(stream, gap_seconds=1800)
    name = f"sss_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r.user_id: (r.n_sessions, r.n_events) for r in spark.table(name).collect()}
    # alice: two events > gap apart = 2 sessions; bob: one real event
    # (the null-ts row is dropped) = 1 session, 1 event
    assert got == {"alice": (2, 2), "bob": (1, 1)}
