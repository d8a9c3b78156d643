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
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    event_types = list(EVENT_TYPES)

    class _Range(InputPartition):
        def __init__(self, lo: int, hi: int):
            self.lo, self.hi = lo, hi

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rows", 100_000))
            self.splits = int(options.get("partitions", 8))
            # pushdown state (pushFilters may tighten before planning)
            self.lo_bound = 0
            self.hi_bound = self.rows
            self.type_mod: int | None = None

        def pushFilters(self, filters):
            """Source-side pruning (Spark 4.1 python-source pushdown):
            event_id range predicates shrink the generated index range
            (the partition-pruning analogue) and an event_type equality
            becomes a stride-4 walk — rows that can't match are never
            produced, not produced-then-filtered. Anything else is
            returned for Spark to evaluate post-scan."""
            from pyspark.sql.datasource import (
                EqualTo,
                GreaterThanOrEqual,
                LessThanOrEqual,
            )

            for f in filters:
                if (
                    isinstance(f, EqualTo)
                    and f.attribute == ("event_type",)
                    and f.value in event_types
                ):
                    self.type_mod = event_types.index(f.value)
                elif (
                    isinstance(f, GreaterThanOrEqual)
                    and f.attribute == ("event_id",)
                    and isinstance(f.value, int)
                ):
                    self.lo_bound = max(self.lo_bound, f.value)
                elif (
                    isinstance(f, LessThanOrEqual)
                    and f.attribute == ("event_id",)
                    and isinstance(f.value, int)
                ):
                    self.hi_bound = min(self.hi_bound, f.value + 1)
                else:
                    yield f

        def partitions(self):
            lo0, hi0 = self.lo_bound, max(self.lo_bound, self.hi_bound)
            n = hi0 - lo0
            step = max(1, -(-n // self.splits)) if n else 1
            return [
                _Range(lo, min(lo + step, hi0)) for lo in range(lo0, hi0, step)
            ] or [_Range(0, 0)]

        def _indices(self, lo: int, hi: int):
            if self.type_mod is None:
                return range(lo, hi)
            start = lo + (self.type_mod - lo) % 4
            return range(start, hi, 4)

        def read(self, partition):
            import pyarrow as pa

            for lo in range(partition.lo, partition.hi, BATCH):
                hi = min(lo + BATCH, partition.hi)
                idx = list(self._indices(lo, hi))
                if not idx:
                    continue
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

    class _StreamReader(SimpleDataSourceStreamReader):
        """Offset-based streaming flavor: the offset is just the next row
        index, each micro-batch advances it by ``batch_rows`` (until the
        optional ``rows`` cap), and ``readBetweenOffsets`` regenerates any
        replayed span bit-identically — determinism IS the recovery story
        (nothing to persist beyond the offset in the checkpoint)."""

        def __init__(self, options):
            self.batch_rows = int(options.get("batch_rows", 1000))
            self.cap = int(options.get("rows", 0))  # 0 = unbounded

        def initialOffset(self):
            return {"i": 0}

        def _rows(self, lo: int, hi: int):
            # a LIST, not a generator: the simple-reader harness pickles
            # the prefetched batch into the checkpoint cache for replay
            return [
                (
                    i,
                    (i * 2654435761) % 997,
                    event_types[i % 4],
                    ((i * 48271) % 100000) / 1000.0,
                )
                for i in range(lo, hi)
            ]

        def read(self, start):
            lo = int(start["i"])
            hi = lo + self.batch_rows
            if self.cap:
                hi = min(hi, self.cap)
            if hi <= lo:
                # ITERATOR on a no-progress poll (past the cap): the
                # harness probes next(it) to verify emptiness — a list
                # would TypeError there
                return iter(()), {"i": lo}
            return self._rows(lo, hi), {"i": max(hi, lo)}

        def readBetweenOffsets(self, start, end):
            return self._rows(int(start["i"]), int(end["i"]))

        def commit(self, end):
            pass

    class SyntheticEvents(DataSource):
        @classmethod
        def name(cls):
            return "pqrs_synth_events"

        def schema(self):
            return "event_id long, user_id long, event_type string, value double"

        def reader(self, schema):
            return _Reader(self.options)

        def simpleStreamReader(self, schema):
            return _StreamReader(self.options)

    return SyntheticEvents


def register(spark) -> None:
    """Idempotently register the source under ``pqrs_synth_events`` (and
    enable python-source filter pushdown, off by default in 4.1)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(synthetic_events_source())
