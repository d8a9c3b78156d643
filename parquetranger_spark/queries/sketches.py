"""Declared queries for the sketch tier (SURVEY §2.4 X9) + the streaming
exact-dedup twin.

Sketch outputs are approximate by nature (HLL++ registers / KLL quantile
sketches are engine-specific), so these queries are declared rows-only;
their accuracy contracts are pytest-asserted against exact answers in
tests/test_sketches.py — the same split the ANN queries use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from .common import load


@query(
    "events_approx_distinct",
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""",
)
def events_approx_distinct(spark, sf_dir):
    """X9: approximate distinct users per event type (HLL++,
    ``approx_count_distinct`` rsd=2%). The sketch aggregates map-side and
    merges registers in the reduce — constant memory per group at any
    scale, where exact countDistinct shuffles every (type, user) pair.

    Oracle surface: register layouts are engine-specific, so the HASHED
    columns are the exact twin (computed in the same pass) while the
    sketch estimate is verified IN-PLAN — ``assert_true`` fails the whole
    query loudly if the HLL estimate strays past 5% relative error. The
    sketch path is exercised and error-bounded on every gate run, and
    the emitted values are SQL-reproducible."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
        F.count_distinct("user_id").alias("n_users"),
    )
    ok = (
        F.abs(F.col("__approx") - F.col("n_users")) / F.col("n_users")
    ) <= F.lit(0.05)
    return agg.where(
        F.assert_true(ok, F.lit("HLL estimate outside 5% of exact")).isNull()
    ).select("event_type", "n_users")


@query(
    "token_quantiles_approx",
    oracle="""
SELECT lang,
       quantile_cont(n_tokens, 0.25) AS p25,
       quantile_cont(n_tokens, 0.5) AS p50,
       quantile_cont(n_tokens, 0.75) AS p75,
       count(*) AS n_docs
FROM (SELECT lang, len(string_split(text, ' ')) AS n_tokens FROM documents)
GROUP BY lang
""",
)
def token_quantiles_approx(spark, sf_dir):
    """X9: approximate token-count quantiles per language
    (``percentile_approx``, accuracy 10000) — single-pass mergeable KLL
    sketch, constant memory per group, the scale path where exact
    percentiles buffer each group.

    Oracle surface: sketch internals are engine-specific, so the hashed
    columns are the exact interpolated percentiles (computed in the same
    aggregation pass; both engines define quantile_cont identically) and
    the sketch is verified IN-PLAN — the query fails loudly if the
    approximate median leaves the exact p40–p60 band (the same contract
    tests/test_sketches.py asserts)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("lang", F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
    agg = toks.groupBy("lang").agg(
        F.percentile_approx("n_tokens", [0.25, 0.5, 0.75], 10000).alias("__qa"),
        F.percentile("n_tokens", [0.25, 0.4, 0.5, 0.6, 0.75]).alias("__qe"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    in_band = (F.col("__qa")[1] >= F.col("__qe")[1]) & (
        F.col("__qa")[1] <= F.col("__qe")[3]
    )
    return agg.where(
        F.assert_true(in_band, F.lit("approx median outside exact p40-p60")).isNull()
    ).select(
        "lang",
        F.col("__qe")[0].alias("p25"),
        F.col("__qe")[2].alias("p50"),
        F.col("__qe")[4].alias("p75"),
        "n_docs",
    )


@query(
    "stream_dedup_exact",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0
)
SELECT count(DISTINCT md5(text)) AS n_unique, count(*) AS n_docs FROM corpus
""",
)
def stream_dedup_exact(spark, sf_dir):
    """X9/X6: streaming exact dedup — ``dropDuplicates`` on the content
    hash over a file stream of the injected-duplicate corpus (state-store
    backed, hash-partitioned by the dedup key; the streaming twin of
    dedup_exact_text). The kept representative per duplicate group is
    arrival-order dependent, so the oracle checks the deterministic
    surface: unique-hash count and total input count."""
    import uuid

    from .common import scratch_dir

    root = scratch_dir("sdedup")
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.where(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    corpus.write.mode("overwrite").parquet(f"{root}/src")
    # input count from the just-written footers — a corpus.count() here
    # would re-scan (and recompute) the frame it just materialized
    import glob as _glob

    import pyarrow.parquet as _pq

    n_docs = sum(
        _pq.ParquetFile(p).metadata.num_rows for p in _glob.glob(f"{root}/src/*.parquet")
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(f"{root}/src")
        .withColumn("__h", F.md5(F.col("text")))
        .dropDuplicates(["__h"])
    )
    name = f"sdedup_{uuid.uuid4().hex[:8]}"
    from ..streaming.ingest import state_partitions

    with state_partitions(spark, 8):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(600)
    return spark.table(name).agg(
        F.count(F.lit(1)).alias("n_unique"), F.lit(n_docs).cast("long").alias("n_docs")
    )


@query(
    "stream_stream_join",
    oracle="""
SELECT v.user_id, count(*) AS n_pairs,
       CAST(SUM(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS sum_delay_us
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND epoch_us(p.ts) >= epoch_us(v.ts)
 AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000
GROUP BY v.user_id
""",
)
def stream_stream_join(spark, sf_dir):
    """X6: watermarked stream-stream interval join — every view paired
    with the same user's purchases within the next hour
    (streaming/ingest.py::stream_stream_interval_join). Both sides are
    file streams; with availableNow the joined output equals the batch
    interval join, so a plain SQL oracle applies. The watermark +
    time-bound keep join state O(users × window) on a real unbounded
    stream."""
    import uuid

    from .common import scratch_dir

    root = scratch_dir("ssj")
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("timestamp_micros(ts div 1000)").alias("ts")
    )
    ev.where(F.col("event_type") == "view").write.mode("overwrite").parquet(f"{root}/v")
    ev.where(F.col("event_type") == "purchase").write.mode("overwrite").parquet(f"{root}/p")
    schema = "user_id long, event_type string, ts timestamp"
    vs = spark.readStream.schema(schema).parquet(f"{root}/v").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    ps = spark.readStream.schema(schema).parquet(f"{root}/p").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    from ..streaming.ingest import stream_stream_interval_join

    joined = stream_stream_interval_join(vs, ps, "user_id", "v_ts", "p_ts", 3600)
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    from ..streaming.ingest import state_partitions

    with state_partitions(spark, 8):
        q = (
            joined.select(
                F.col("l.user_id").alias("user_id"),
                (F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("v_ts"))).alias("delay_us"),
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(600)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("delay_us").alias("sum_delay_us"))
    )


@query(
    "events_hll_union",
    oracle="""
SELECT count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       count(DISTINCT event_type) AS n_types
FROM events
""",
)
def events_hll_union(spark, sf_dir):
    """X9: mergeable sketch OBJECTS — one HLL sketch per event type
    (hll_sketch_agg), unioned into a global distinct-user estimate
    (hll_union_agg). This is the incremental-pipeline pattern: per-batch /
    per-partition sketches persist as binary columns and merge across any
    grouping without re-reading raw data.

    Oracle surface: register layout is engine-specific, so the hashed
    columns are exact (global distinct users / events / types) and the
    union-merged estimate is verified IN-PLAN against the exact distinct
    count (≤5% relative error, assert_true fails the query loudly) —
    the sketch build + union path runs on every gate run."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("__approx"),
        F.sum("n_events").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
    )
    exact = ev.agg(F.count_distinct("user_id").alias("n_users"))
    out = merged.crossJoin(exact)  # 1 row × 1 row
    ok = (F.abs(F.col("__approx") - F.col("n_users")) / F.col("n_users")) <= F.lit(0.05)
    return out.where(
        F.assert_true(ok, F.lit("HLL union estimate outside 5% of exact")).isNull()
    ).select("n_users", "n_events", "n_types")


@query(
    "stream_incremental_rollup",
    oracle="""
SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
""",
)
def stream_incremental_rollup(spark, sf_dir):
    """X9/X6: incrementally-maintained materialized rollup — the event
    stream lands as per-batch partial aggregates merged additively into a
    grouped TableRepo (streaming/ingest.py::incremental_rollup_into_repo),
    3 micro-batches via maxFilesPerTrigger. Partial sums ride DECIMAL, so
    the materialized table is bit-identical to the one-shot batch
    aggregate the oracle runs — the incremental-pipeline shape where
    history is never re-scanned."""
    from ..sources.table_repo import TableRepo
    from ..streaming.ingest import incremental_rollup_into_repo
    from .common import DEC, scratch_dir

    root = scratch_dir("incroll")
    ev = load(spark, sf_dir, "events").select(
        F.expr("ts div 3600000000000").alias("hour_bucket"), "event_type", "value"
    )
    ev.repartition(6).write.mode("overwrite").parquet(f"{root}/src")
    stream = (
        spark.readStream.schema("hour_bucket long, event_type string, value double")
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{root}/src")
        .withColumn("value_dec", F.col("value").cast(DEC))
        .drop("value")
    )
    # manifest mode: the per-epoch data+fence partition overwrite commits
    # as ONE atomic manifest flip — crash-exact, where a files-mode
    # dynamic overwrite (delete-then-rename) could tear mid-crash
    t = TableRepo(
        f"{root}/rollup", group_cols="event_type", commit_mode="manifest", spark=spark
    )
    q = incremental_rollup_into_repo(
        stream, t, ["event_type", "hour_bucket"], ["value_dec"], f"{root}/ckpt"
    )
    q.awaitTermination(600)
    return t.get_full_df().select(
        "hour_bucket",
        "event_type",
        "n",
        F.col("value_dec").cast("double").alias("sum_value"),
    )


@query(
    "token_quantiles_exact",
    oracle="""
SELECT lang,
       quantile_cont(n_tokens, 0.25) AS p25,
       quantile_cont(n_tokens, 0.5) AS p50,
       quantile_cont(n_tokens, 0.75) AS p75,
       count(*) AS n_docs
FROM (SELECT lang, len(string_split(text, ' ')) AS n_tokens FROM documents)
GROUP BY lang
""",
)
def token_quantiles_exact(spark, sf_dir):
    """X9's exact twin: per-language token-count quartiles via the exact
    interpolated percentile (both engines define it as the same linear
    interpolation over the sorted group, so the doubles are
    bit-identical). The exact form buffers each group's values — the
    right tool at dimension-table cardinalities, with
    token_quantiles_approx as the constant-memory scale path."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("lang", F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
    return toks.groupBy("lang").agg(
        F.percentile("n_tokens", 0.25).alias("p25"),
        F.percentile("n_tokens", 0.5).alias("p50"),
        F.percentile("n_tokens", 0.75).alias("p75"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query(
    "stream_running_max",
    oracle="""
SELECT user_id, max(value) AS max_value, count(*) AS n_events
FROM events GROUP BY user_id
""",
)
def stream_running_max(spark, sf_dir):
    """X6: second custom stateful operator — per-user running (max, count)
    via applyInPandasWithState (streaming/sessions.py::streaming_running_agg),
    scalar state per key, multiple micro-batches (maxFilesPerTrigger).
    Both running outputs are monotone, so the per-key max over every
    emitted update equals the batch answer exactly — no approximation in
    the check."""
    import uuid

    from ..streaming.ingest import state_partitions
    from ..streaming.sessions import streaming_running_agg
    from .common import scratch_dir

    root = scratch_dir("srmax")
    ev = load(spark, sf_dir, "events").select("user_id", "value")
    ev.repartition(4).write.mode("overwrite").parquet(f"{root}/src")
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{root}/src")
    )
    out = streaming_running_agg(stream)
    name = f"srmax_{uuid.uuid4().hex[:8]}"
    with state_partitions(spark, 8):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(600)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("running_max").alias("max_value"),
            F.max("running_n").alias("n_events"),
        )
    )


@query(
    "stream_static_enrich",
    oracle="""
SELECT c.c_mktsegment,
       count(*) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def stream_static_enrich(spark, sf_dir):
    """X6 (round 4): stream-static enrichment — the streaming twin of
    events_dim_join_agg. Each micro-batch of the event stream joins the
    static customer dimension with an explicit broadcast (the dim is
    planned ONCE and re-broadcast per batch; the stream side never
    shuffles for the join), then feeds a complete-mode aggregation whose
    state is 5 segments × two values. Decimal-routed sums make the
    result independent of micro-batch arrival order — which is what lets
    a streaming aggregation share a batch oracle at all."""
    import uuid

    from .common import scratch_dir

    root = scratch_dir("senrich")
    ev = load(spark, sf_dir, "events").select("user_id", "value")
    ev.write.mode("overwrite").parquet(f"{root}/src")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", "8")
        .parquet(f"{root}/src")
        .join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("__sv"),
        )
    )
    name = f"senrich_{uuid.uuid4().hex[:8]}"
    from ..streaming.ingest import state_partitions

    with state_partitions(spark, 8):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
    return spark.table(name).select(
        "c_mktsegment", "n", F.col("__sv").cast("double").alias("sum_value")
    )


def _has_protobuf() -> bool:
    """transformWithState's python↔state-server protocol needs protobuf;
    where the dependency is absent, streaming_profile_tws transparently
    runs its applyInPandasWithState twin (identical contract) — so the
    query registers unconditionally."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no parent 'google' namespace package
        return False


@query(
    "stream_tws_profile",
    oracle="""
SELECT user_id, count(*) AS n_events,
       count(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
""",
)
def stream_tws_profile(spark, sf_dir):
    """X6: third custom stateful operator — per-user activity profile via
    Spark 4's transformWithStateInPandas (streaming/sessions.py::
    streaming_profile_tws): ValueState event count + MapState per-type
    counts, multiple micro-batches (falls back to the
    applyInPandasWithState twin where protobuf is unavailable — same
    state machine, same outputs). Both outputs are monotone, so the
    per-key max over the emitted updates equals the batch aggregate
    exactly; the oracle states that aggregate in SQL."""
    import uuid

    from ..streaming.ingest import rocksdb_state_store, state_partitions
    from ..streaming.sessions import streaming_profile_tws
    from .common import scratch_dir

    root = scratch_dir("stws")
    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    ev.repartition(4).write.mode("overwrite").parquet(f"{root}/src")
    stream = (
        spark.readStream.schema("user_id long, event_type string")
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{root}/src")
    )
    out = streaming_profile_tws(stream)
    name = f"stws_{uuid.uuid4().hex[:8]}"
    # TWS requires the RocksDB state store; the fallback runs on the
    # default provider too, but keeping one provider keeps runs comparable
    ctx = rocksdb_state_store(spark) if _has_protobuf() else _nullctx()
    with state_partitions(spark, 8), ctx:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(600)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_types").alias("n_types"),
        )
    )


def _nullctx():
    from contextlib import nullcontext

    return nullcontext()


@query(
    "events_cms_heavy_hitters",
    oracle="""
SELECT event_type, count(*) AS n,
       (SELECT count(*) FROM events) AS n_total
FROM events GROUP BY event_type
HAVING count(*) >= (SELECT count(*) // 10 FROM events)
""",
)
def events_cms_heavy_hitters(spark, sf_dir):
    """X9: count–min sketch heavy hitters, the textbook sketch-then-
    exact-rescan shape — one mergeable CMS over the event-type stream
    (``count_min_sketch`` aggregate: integer counter grids, merge =
    elementwise add, so partial aggregation and cross-shard unions are
    exact-commutative); point estimates for candidate keys read
    driver-side from the (tiny) sketch binary; then, because CMS NEVER
    underestimates, the estimate-filtered candidates are a guaranteed
    superset of the true heavy hitters (count ≥ n/10) and one exact
    re-count restricted to them recovers the true set exactly. The
    emitted (key, exact count) surface is SQL-reproducible; the
    upper-bound contract est ≥ exact is asserted in-query."""
    ev = load(spark, sf_dir, "events")
    row = ev.agg(
        F.count_min_sketch("event_type", F.lit(0.001), F.lit(0.99), F.lit(42)).alias(
            "sk"
        ),
        F.count(F.lit(1)).alias("n"),
        F.sort_array(F.collect_set("event_type")).alias("types"),
    ).first()
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(row["sk"]))
    )
    n_total, threshold = int(row["n"]), int(row["n"]) // 10
    est = {t: int(cms.estimateCount(t)) for t in row["types"]}
    cand = [t for t, e in est.items() if e >= threshold]
    rescan = (
        ev.where(F.col("event_type").isin(cand))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= threshold)
    )
    ok = F.col("n") <= F.lit(0).cast("long") + F.element_at(
        F.create_map(*[F.lit(x) for kv in est.items() for x in kv]).cast(
            "map<string,long>"
        ),
        F.col("event_type"),
    )
    return rescan.where(
        F.assert_true(ok, F.lit("CMS estimate below exact count")).isNull()
    ).select("event_type", "n", F.lit(n_total).cast("long").alias("n_total"))


@query(
    "stream_dedup_within_watermark",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 9 = 0
)
SELECT count(DISTINCT md5(text)) AS n_unique, count(*) AS n_docs FROM corpus
""",
)
def stream_dedup_within_watermark(spark, sf_dir):
    """X9/X6: WATERMARK-BOUNDED streaming dedup
    (``dropDuplicatesWithinWatermark``) — the production form of
    stream_dedup_exact: plain streaming dropDuplicates keeps every key
    in the state store FOREVER (state = O(stream)); the within-watermark
    variant expires keys once the watermark passes them, bounding state
    by the dedup horizon. Duplicates here share their original's event
    time, so every dup lands inside the horizon and the result equals
    exact dedup — which is what lets the batch oracle check it."""
    import uuid

    from ..streaming.ingest import state_partitions
    from .common import scratch_dir

    root = scratch_dir("sdwm")
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.where(F.col("doc_id") % 9 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    # deterministic event time derived from the ORIGINAL id so a dup and
    # its source share a timestamp (both sides use doc_id mod 100000)
    # +1000 min offset: an event time of exactly epoch 0 equals the
    # operator's INITIAL watermark and is discarded as late before any
    # data has set a real watermark
    corpus = corpus.withColumn(
        "ts", F.expr("timestamp_micros(((doc_id % 100000) + 1000) * 60000000)")
    )
    # ONE file → one micro-batch: with several batches the watermark
    # advanced by batch 1 would discard batch 2's older-event-time rows
    # as LATE (that is the operator's contract — bounded state means late
    # data ages out); the oracle checks the no-late-data equivalence, so
    # feed everything inside one watermark window
    corpus.coalesce(1).write.mode("overwrite").parquet(f"{root}/src")
    import glob as _glob

    import pyarrow.parquet as _pq

    n_docs = sum(
        _pq.ParquetFile(p).metadata.num_rows
        for p in _glob.glob(f"{root}/src/*.parquet")
    )
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(f"{root}/src")
        .withColumn("__h", F.md5(F.col("text")))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["__h"])
    )
    name = f"sdwm_{uuid.uuid4().hex[:8]}"
    with state_partitions(spark, 8):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(600)
    return spark.table(name).agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.lit(n_docs).cast("long").alias("n_docs"),
    )
