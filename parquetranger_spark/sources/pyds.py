"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API) — a
deterministic synthetic-events generator, the batch/deterministic cousin
of Spark's ``rate`` source.

Why it exists here: the reference's ingestion surface ultimately feeds on
programmatic record producers (RecordWriter loops over generated dicts,
core.py:458-505); a first-class *source* moves that production INTO the
scan so generation is distributed, partitioned, and plan-visible instead
of a driver-side loop. Every value is a pure integer function of the row
index, so an independent engine can recompute the exact same table from
``generate_series`` — which is how the driver's DuckDB oracle
value-checks a source that never touches disk.

Scale shape: ``partitions`` splits the index range into equal slices (one
InputPartition per requested split → one Spark task each); ``read``
yields pyarrow RecordBatches (the Arrow fast path — no per-row Python
tuples crossing the boundary)."""

from __future__ import annotations

EVENT_TYPES = ["view", "click", "purchase", "refund"]
BATCH = 16384


def synthetic_events_source():
    """Build the DataSource class. Defined inside a factory so cloudpickle
    serializes the class BY VALUE to executor python workers — they never
    need this package importable (same closure rule as the ingestor's
    shred and the TWS processor)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    event_types = list(EVENT_TYPES)

    class _Range(InputPartition):
        def __init__(self, lo: int, hi: int):
            self.lo, self.hi = lo, hi

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rows", 100_000))
            self.splits = int(options.get("partitions", 8))

        def partitions(self):
            step = max(1, -(-self.rows // self.splits))
            return [
                _Range(lo, min(lo + step, self.rows))
                for lo in range(0, self.rows, step)
            ]

        def read(self, partition):
            import pyarrow as pa

            for lo in range(partition.lo, partition.hi, BATCH):
                hi = min(lo + BATCH, partition.hi)
                idx = range(lo, hi)
                yield pa.record_batch(
                    {
                        "event_id": pa.array(idx, pa.int64()),
                        "user_id": pa.array(
                            [(i * 2654435761) % 997 for i in idx], pa.int64()
                        ),
                        "event_type": pa.array(
                            [event_types[i % 4] for i in idx], pa.string()
                        ),
                        "value": pa.array(
                            [((i * 48271) % 100000) / 1000.0 for i in idx],
                            pa.float64(),
                        ),
                    }
                )

    class SyntheticEvents(DataSource):
        @classmethod
        def name(cls):
            return "pqrs_synth_events"

        def schema(self):
            return "event_id long, user_id long, event_type string, value double"

        def reader(self, schema):
            return _Reader(self.options)

    return SyntheticEvents


def register(spark) -> None:
    """Idempotently register the source under ``pqrs_synth_events``."""
    spark.dataSource.register(synthetic_events_source())
