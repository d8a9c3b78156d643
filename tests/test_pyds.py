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
