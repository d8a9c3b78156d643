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
