"""Writers, ObjIngestor, distributed shredder, streaming sink — reference
tests/test_writer.py + tests/test_ingestors.py analogues (F9/F11)."""

import json
import os

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquetranger_spark import TableRepo
from parquetranger_spark.sources.ingestor import ObjIngestor, shred_json_df
from parquetranger_spark.sources.writers import DfBatchWriter, FixedRecordWriter, RecordWriter


def test_record_writer_flush(spark, tmp_root):
    # F9: dict records, flush every 7 (reference tests/test_writer.py:8-23)
    t = TableRepo(f"{tmp_root}/t", index_cols="i")
    with RecordWriter(t, record_limit=7) as w:
        for i in range(30):
            w.add_record({"i": i, "thing": i * 2})
    got = t.get_full_df().toPandas().sort_values("i")
    assert got.i.tolist() == list(range(30))
    assert got.thing.tolist() == [i * 2 for i in range(30)]


def test_replacing_record_writer(spark, tmp_root):
    t = TableRepo(f"{tmp_root}/t", index_cols="i")
    with RecordWriter(t, record_limit=100) as w:
        for i in range(10):
            w.add_record({"i": i, "thing": i})
    with RecordWriter(t, record_limit=100, replace=True) as w:
        w.add_record({"i": 5, "thing": 999})
    got = t.get_full_df().toPandas().sort_values("i")
    assert got[got.i == 5].thing.tolist() == [999]
    assert len(got) == 10


def test_fixed_record_writer_missing_keys(spark, tmp_root):
    # F9: random subsets of columns projected to fixed [a, b]
    t = TableRepo(f"{tmp_root}/t")
    schema = T.StructType(
        [T.StructField("a", T.DoubleType()), T.StructField("b", T.DoubleType())]
    )
    with FixedRecordWriter(t, schema=schema, record_limit=3) as w:
        w.add_record({"a": 1.0, "b": 2.0})
        w.add_record({"a": 3.0, "c": 9.0})  # c dropped, b null
        w.add_record({"b": 4.0})  # a null
    got = t.get_full_df().toPandas()
    assert sorted(got.columns) == ["a", "b"]
    assert got.a.isna().sum() == 1 and got.b.isna().sum() == 1


def test_df_batch_writer(spark, tmp_root):
    t = TableRepo(f"{tmp_root}/t", index_cols="i")
    with DfBatchWriter(t, record_limit=70) as w:
        for b in range(5):
            w.add_df(
                spark.createDataFrame(
                    pd.DataFrame({"i": range(b * 30, b * 30 + 30), "v": [b] * 30})
                )
            )
    assert t.get_full_df().count() == 150


def test_df_batch_writer_add_is_job_free(spark, tmp_root):
    # the reference counts pandas rows for free (core.py:504-505); the
    # Spark analogue must not run one job per buffered frame — jobs are
    # O(flushes), not O(add_df calls)
    t = TableRepo(f"{tmp_root}/t", index_cols="i")
    sc = spark.sparkContext
    sc.setJobGroup("dfbw_adds", "buffering")
    w = DfBatchWriter(t, record_limit=1_000_000)
    for b in range(5):
        w.add_df(
            spark.createDataFrame(pd.DataFrame({"i": range(b * 10, b * 10 + 10), "v": [b] * 10}))
        )
    adds_jobs = sc.statusTracker().getJobIdsForGroup("dfbw_adds")
    sc.setJobGroup("dfbw_flush", "flushing")
    w.close()
    assert list(adds_jobs) == []  # zero jobs while buffering
    assert w.written_count == 50  # captured via observe during the flush
    assert t.get_full_df().count() == 50


def test_fixed_writer_cols_list(spark, tmp_root):
    # reference core.py:233 passes a plain column-name list
    t = TableRepo(f"{tmp_root}/t")
    with t.get_extending_fixed_dict_batch_writer(["a", "b"], max_records=3) as w:
        w.add_record({"a": 1.0, "b": 2.0})
        w.add_record({"a": 3.0, "c": 9.0})  # c dropped, b null
        w.add_record({"b": 4.0})  # a null
    got = t.get_full_df().toPandas()
    assert sorted(got.columns) == ["a", "b"]
    assert got.a.isna().sum() == 1 and got.b.isna().sum() == 1


def test_record_count_resets_per_flush(spark, tmp_root):
    # reference _write resets record_count per batch (core.py:497-505)
    t = TableRepo(f"{tmp_root}/t", index_cols="i")
    w = RecordWriter(t, record_limit=3)
    for i in range(7):
        w.add_record({"i": i, "v": float(i)})
    assert w.record_count == 1  # 2 auto-flushes at 3 and 6; one buffered
    w.close()
    assert w.record_count == 0 and w.written_count == 7


def test_obj_ingestor_nested(spark, tmp_root):
    # F11-shaped: atoms + nested dict + nested list, parent linkage
    root = f"{tmp_root}/forest"
    with ObjIngestor(root, root_id_key="id_", spark=spark) as ing:
        for i in range(20):
            ing.ingest(
                {
                    "id_": f"r{i}",
                    "x": i,
                    "child": {"y": i * 10},
                    "items": [{"z": j} for j in range(i % 3)],
                }
            )
        ing.ingest({})  # no-op (reference ingest, ingestor.py:56-57)
    # key map written with original key names
    km = json.load(open(os.path.join(root, "key-map.json")))
    assert set(km.values()) == {"child", "items"}
    # three tables: root, child, list items
    tbl_dirs = sorted(
        os.path.relpath(d, root)
        for d, _, fs in os.walk(root)
        if any(f.endswith(".parquet") for f in fs)
    )
    assert len(tbl_dirs) == 3
    root_tbl = [d for d in tbl_dirs if "/" not in d][0]
    got = spark.read.parquet(os.path.join(root, root_tbl)).toPandas()
    assert len(got) == 20 and set(got.columns) == {"id_", "x"}
    child_tbl = [d for d in tbl_dirs if "key-" in d and "list" not in d][0]
    child = spark.read.parquet(os.path.join(root, child_tbl)).toPandas()
    assert len(child) == 20 and set(child.__parent_id) == {f"r{i}" for i in range(20)}
    items_tbl = [d for d in tbl_dirs if "list" in d][0]
    items = spark.read.parquet(os.path.join(root, items_tbl)).toPandas()
    assert len(items) == sum(i % 3 for i in range(20))


def test_distributed_shredder_matches_driver_side(spark, tmp_root):
    objs = [
        {"id_": i, "a": f"v{i}", "nest": {"b": i * 2}, "lst": [{"c": j} for j in range(i % 2)]}
        for i in range(50)
    ]
    df = spark.createDataFrame([(json.dumps(o),) for o in objs], "obj string")
    counts = shred_json_df(df, "obj", f"{tmp_root}/dist", root_id_key="id_")
    # same forest via the driver-side ingestor
    with ObjIngestor(f"{tmp_root}/drv", root_id_key="id_", spark=spark) as ing:
        for o in objs:
            ing.ingest(o)
    drv_counts = {
        "/".join(k): spark.read.parquet(os.path.join(f"{tmp_root}/drv", *k)).count()
        for k in ing.writers
    }
    assert counts == drv_counts


def test_shredder_widens_past_sampled_row_range(spark, tmp_root):
    # the schema hash keys on python type NAME, so an int above int64 lands
    # in the same table as small ints; sample-row inference alone would
    # from_json it to null — the shredder must widen (full-scan inference
    # fallback), never silently lose the value
    big = 2**75
    objs = [{"id_": i, "n": big if i == 3 else i} for i in range(10)]
    df = spark.createDataFrame([(json.dumps(o),) for o in objs], "obj string")
    counts = shred_json_df(df, "obj", f"{tmp_root}/wide", root_id_key="id_")
    assert sum(counts.values()) == 10
    tbl_dir = next(
        d for d, _, fs in os.walk(f"{tmp_root}/wide") if any(f.endswith(".parquet") for f in fs)
    )
    got = spark.read.parquet(tbl_dir).toPandas()
    assert len(got) == 10 and got.n.notna().all()
    assert float(got.n.max()) == float(big)


def test_streaming_sink_into_repo(spark, tmp_root):
    from parquetranger_spark.streaming.ingest import stream_into_repo

    src_dir = f"{tmp_root}/src"
    os.makedirs(src_dir)
    pdf = pd.DataFrame({"k": range(100), "grp": ["a", "b"] * 50, "v": [1.5] * 100})
    spark.createDataFrame(pdf).write.parquet(src_dir, mode="overwrite")
    t = TableRepo(f"{tmp_root}/sink", group_cols="grp", index_cols="k")
    stream = spark.readStream.schema("k long, grp string, v double").parquet(src_dir)
    q = stream_into_repo(stream, t, checkpoint=f"{tmp_root}/ckpt")
    q.awaitTermination(120)
    got = t.get_full_df()
    assert got.count() == 100
    assert got.where(F.col("grp") == "a").count() == 50


def test_streaming_windowed_counts(spark, tmp_root):
    from parquetranger_spark.streaming.ingest import windowed_event_counts

    src_dir = f"{tmp_root}/ev"
    os.makedirs(src_dir)
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=120, freq="1min"),
            "event_type": ["click", "view"] * 60,
            "value": [1.0] * 120,
        }
    )
    spark.createDataFrame(pdf).write.parquet(src_dir, mode="overwrite")
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").parquet(
        src_dir
    )
    agg = windowed_event_counts(stream, window="1 hour", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("wincounts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM wincounts").toPandas()
    # 2 hours × 2 event types
    assert len(got) == 4 and got.n.sum() == 120


def test_writer_factories(spark, tmp_root):
    # reference core.py:230-243 factory surface
    t = TableRepo(f"{tmp_root}/t", index_cols="i")
    with t.get_extending_dict_batch_writer(5) as w:
        for i in range(12):
            w.add_record({"i": i, "v": float(i)})
    assert t.get_full_df().count() == 12
    with t.get_replacing_dict_batch_writer(5) as w:
        w.add_record({"i": 3, "v": 99.0})
    got = t.get_full_df().where("i = 3").collect()
    assert [r.v for r in got] == [99.0]
    df = spark.createDataFrame([(100, 1.0)], "i long, v double")
    with t.get_extending_df_batch_writer(1) as w:
        w.add_df(df)
    assert t.get_full_df().count() == 13
    # single-file read restores rows
    assert sum(t.read_df_from_path(p).count() for p in t.paths) == 13


def test_df_batch_writer_honors_record_limit_adaptively(spark, tmp_root):
    """After one calibrating flush, auto-flush granularity approximates
    record_limit rows — without any count job on add_df."""
    from parquetranger_spark import TableRepo

    t = TableRepo(f"{tmp_root}/t", index_cols="k")
    w = DfBatchWriter(t, record_limit=10)
    frame = spark.range(8).withColumnRenamed("id", "k")
    w.add_df(frame)
    w.flush()  # calibrates: ~8 rows/frame -> flush_after = 10 // 8 = 1
    assert w._flush_after == 1
    before = w.written_count
    w.add_df(spark.range(8, 16).withColumnRenamed("id", "k"))
    # auto-flushed immediately under the recalibrated trigger
    assert w.written_count == before + 8
    w.close()
    assert t.get_full_df().count() == 16


def test_incremental_rollup_multi_batch_exact(spark, tmp_path):
    """The additively-merged rollup must equal the one-shot batch aggregate
    bit-for-bit, and must actually have been built across multiple epochs
    (maxFilesPerTrigger=1 over 4 source files)."""
    import pyspark.sql.functions as F

    from parquetranger_spark.sources.table_repo import TableRepo
    from parquetranger_spark.streaming.ingest import incremental_rollup_into_repo

    rows = [(i % 3, f"g{i % 2}", float(i) + 0.125) for i in range(400)]
    src = spark.createDataFrame(rows, "bucket long, grp string, value double")
    src.repartition(4).write.mode("overwrite").parquet(str(tmp_path / "src"))
    stream = (
        spark.readStream.schema("bucket long, grp string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
        .withColumn("value_dec", F.col("value").cast("decimal(28,6)"))
        .drop("value")
    )
    t = TableRepo(str(tmp_path / "rollup"), group_cols="grp", spark=spark)
    q = incremental_rollup_into_repo(
        stream, t, ["grp", "bucket"], ["value_dec"], str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    assert q.lastProgress["batchId"] >= 2, q.lastProgress
    got = {
        (r.grp, r.bucket): (r.n, r.value_dec)
        for r in t.get_full_df().collect()
    }
    want = {
        (r.grp, r.bucket): (r.n, r.value_dec)
        for r in src.groupBy("grp", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("value_dec"),
        )
        .collect()
    }
    assert got == want


def test_incremental_rollup_restart_exactly_once(spark, tmp_path):
    """Restarting the stream with the same checkpoint after new files land
    processes ONLY the new files: the merged rollup equals the full batch
    aggregate — no double-counting of already-ingested batches."""
    import pyspark.sql.functions as F

    from parquetranger_spark.sources.table_repo import TableRepo
    from parquetranger_spark.streaming.ingest import incremental_rollup_into_repo

    def frame(lo, hi):
        return spark.createDataFrame(
            [(i % 3, f"g{i % 2}", float(i) + 0.25) for i in range(lo, hi)],
            "bucket long, grp string, value double",
        )

    src = str(tmp_path / "src")
    frame(0, 200).repartition(2).write.mode("append").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema("bucket long, grp string, value double")
            .parquet(src)
            .withColumn("value_dec", F.col("value").cast("decimal(28,6)"))
            .drop("value")
        )
        t = TableRepo(str(tmp_path / "rollup"), group_cols="grp", spark=spark)
        q = incremental_rollup_into_repo(
            stream, t, ["grp", "bucket"], ["value_dec"], str(tmp_path / "ckpt")
        )
        q.awaitTermination(300)
        return t

    run_once()
    frame(200, 300).repartition(2).write.mode("append").parquet(src)
    t = run_once()

    got = {(r.grp, r.bucket): (r.n, r.value_dec) for r in t.get_full_df().collect()}
    want = {
        (r.grp, r.bucket): (r.n, r.value_dec)
        for r in frame(0, 300)
        .groupBy("grp", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("value_dec"),
        )
        .collect()
    }
    assert got == want


def test_rollup_merge_replay_idempotent(spark, tmp_path):
    """foreachBatch replays a batch whose writes finished but whose
    checkpoint didn't: the epoch fence must make the re-merge a no-op, so
    counts never double."""
    import pyspark.sql.functions as F

    from parquetranger_spark.sources.table_repo import TableRepo
    from parquetranger_spark.streaming.ingest import merge_rollup_batch

    t = TableRepo(str(tmp_path / "rollup"), group_cols="grp", spark=spark)
    batch = spark.createDataFrame(
        [(0, "g0", 1.5), (1, "g0", 2.5), (0, "g1", 3.5)],
        "bucket long, grp string, value double",
    ).withColumn("value_dec", F.col("value").cast("decimal(28,6)")).drop("value")

    for _ in range(3):  # original + two replays of the SAME epoch
        merge_rollup_batch(t, batch, ["grp", "bucket"], ["value_dec"], epoch_id=0, stream_id="s1")
    got = {(r.grp, r.bucket): (r.n, float(r.value_dec)) for r in t.get_full_df().collect()}
    assert got == {("g0", 0): (1, 1.5), ("g0", 1): (1, 2.5), ("g1", 0): (1, 3.5)}

    # a genuinely new epoch still merges
    merge_rollup_batch(t, batch, ["grp", "bucket"], ["value_dec"], epoch_id=1, stream_id="s1")
    got = {(r.grp, r.bucket): r.n for r in t.get_full_df().collect()}
    assert got == {("g0", 0): 2, ("g0", 1): 2, ("g1", 0): 2}


def test_rollup_fresh_checkpoint_still_merges(spark, tmp_path):
    """A FRESH checkpoint (epoch ids restart at 0) over an existing
    rollup table must still merge new data — the epoch fence is scoped by
    stream id, never by the bare epoch number."""
    import pyspark.sql.functions as F

    from parquetranger_spark.sources.table_repo import TableRepo
    from parquetranger_spark.streaming.ingest import incremental_rollup_into_repo

    def frame(lo, hi):
        return spark.createDataFrame(
            [(i % 3, f"g{i % 2}", 1.0) for i in range(lo, hi)],
            "bucket long, grp string, value double",
        )

    t = TableRepo(str(tmp_path / "rollup"), group_cols="grp", spark=spark)

    def run(src, ckpt):
        stream = (
            spark.readStream.schema("bucket long, grp string, value double")
            .parquet(src)
            .withColumn("value_dec", F.col("value").cast("decimal(28,6)"))
            .drop("value")
        )
        q = incremental_rollup_into_repo(
            stream, t, ["grp", "bucket"], ["value_dec"], ckpt
        )
        q.awaitTermination(300)

    frame(0, 120).write.mode("overwrite").parquet(str(tmp_path / "src1"))
    run(str(tmp_path / "src1"), str(tmp_path / "ckptA"))
    # new feed, new checkpoint, same table — epochs restart at 0
    frame(120, 180).write.mode("overwrite").parquet(str(tmp_path / "src2"))
    run(str(tmp_path / "src2"), str(tmp_path / "ckptB"))

    total = t.get_full_df().agg(F.sum("n")).collect()[0][0]
    assert total == 180  # src2's rows merged, not silently dropped


def test_repo_stream_source_roundtrip(spark, tmp_root):
    """TableRepo.stream(): the repo is a streaming SOURCE — rows appended
    batch-side arrive as micro-batches with the sidecar schema; a
    repo→stream→repo pipeline preserves the row set."""
    import uuid

    import pandas as pd

    from parquetranger_spark import TableRepo
    from parquetranger_spark.streaming.ingest import stream_into_repo

    src = TableRepo(f"{tmp_root}/src_t", group_cols="C", index_cols="k", spark=spark)
    pdf = pd.DataFrame({"k": [f"k{i}" for i in range(12)],
                        "A": list(range(12)),
                        "C": [str(i % 3) for i in range(12)]})
    src.extend(spark.createDataFrame(pdf))
    dst = TableRepo(f"{tmp_root}/dst_t", group_cols="C", index_cols="k", spark=spark)
    q = stream_into_repo(
        src.stream(max_files_per_trigger=2), dst, checkpoint=f"{tmp_root}/ck_{uuid.uuid4().hex[:6]}"
    )
    q.awaitTermination(300)
    got = sorted((r["k"], r["A"], r["C"]) for r in dst.get_full_df().collect())
    want = sorted(map(tuple, pdf[["k", "A", "C"]].itertuples(index=False)))
    assert got == want
