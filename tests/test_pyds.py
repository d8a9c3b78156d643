"""Custom Python data source (sources/pyds.py): partition fan-out and
determinism."""

from pyspark.sql import functions as F

from parquetranger_spark.sources.pyds import register


def test_generator_partitions_and_determinism(spark):
    register(spark)
    r = (
        spark.read.format("pqrs_synth_events")
        .option("rows", 1000)
        .option("partitions", 4)
        .load()
    )
    # one Spark task per InputPartition — the parallelism knob is real
    assert r.rdd.getNumPartitions() == 4
    a = sorted(map(tuple, r.collect()))
    b = sorted(map(tuple, r.collect()))
    assert a == b and len(a) == 1000
    # spot-check the deterministic value law
    row = dict(zip(r.columns, a[7]))
    assert row["event_id"] == 7
    assert row["user_id"] == (7 * 2654435761) % 997
    assert row["value"] == ((7 * 48271) % 100000) / 1000.0


def test_pushdown_prunes_generation(spark):
    """Filter pushdown (Spark 4.1 python-source API): range predicates on
    event_id and equality on event_type must reach the reader so pruned
    rows are never generated — and query results stay correct."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThanOrEqual

    from parquetranger_spark.sources.pyds import synthetic_events_source

    src = synthetic_events_source()({"rows": "1000", "partitions": "4"})
    rd = src.reader(None)
    residual = list(
        rd.pushFilters(
            [
                GreaterThanOrEqual(("event_id",), 100),
                LessThanOrEqual(("event_id",), 499),
                EqualTo(("event_type",), "click"),
                EqualTo(("user_id",), 5),  # unsupported → residual
            ]
        )
    )
    assert [type(f).__name__ for f in residual] == ["EqualTo"]
    produced = sum(
        b.num_rows for p in rd.partitions() for b in rd.read(p)
    )
    assert produced == 100  # 400 ids in range, 1-in-4 match the type

    # end-to-end through Spark: same filters, same answer as unfiltered+where
    register(spark)
    base = (
        spark.read.format("pqrs_synth_events")
        .option("rows", 1000)
        .option("partitions", 4)
        .load()
    )
    got = base.where(
        (F.col("event_id") >= 100)
        & (F.col("event_id") <= 499)
        & (F.col("event_type") == "click")
    ).count()
    assert got == 100


def test_streaming_generator_matches_batch(spark, tmp_path):
    """The streaming flavor (SimpleDataSourceStreamReader): a capped run
    under availableNow must produce exactly the batch source's table —
    offsets advance deterministically and replay spans regenerate
    bit-identically."""
    import uuid

    register(spark)
    stream = (
        spark.readStream.format("pqrs_synth_events")
        .option("rows", 5000)
        .option("batch_rows", 1000)
        .load()
    )
    name = f"pyds_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # the simple stream reader advances one batch_rows span per
    # micro-batch until the cap; poll until all 5 batches landed
    import time

    deadline = time.monotonic() + 240
    while time.monotonic() < deadline:
        if spark.table(name).count() >= 5000:
            break
        time.sleep(0.5)
    q.stop()
    got = sorted(map(tuple, spark.table(name).collect()))
    want = sorted(
        map(
            tuple,
            spark.read.format("pqrs_synth_events")
            .option("rows", 5000)
            .load()
            .collect(),
        )
    )
    assert got == want and len(got) == 5000
