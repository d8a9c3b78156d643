"""Buffered record/batch writers — the reference's streaming-ingest surface.

Reference: /root/reference/parquetranger/core.py:458-523 —
``RecordWriter`` buffers dict records and flushes every ``record_limit``
rows (default 1,000,000, core.py:461); ``FixedRecordWriter`` (core.py:
508-513) projects records to a fixed column set with missing keys → null;
``DfBatchWriter`` (core.py:516-523) buffers whole DataFrames. All flush on
close / context exit; factories on TableRepo (core.py:230-243) choose
extend (append) vs replace_records (upsert) as the flush action.

Spark-first shape: a flush turns the buffer into one Arrow-backed
``spark.createDataFrame`` and hands it to the TableRepo write path — i.e.
micro-batching, the same execution shape Structured Streaming's
``foreachBatch`` produces (see streaming/ingest.py). Per-record work stays
O(1) python; all heavy lifting is one distributed write per flush.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class RecordWriter:
    """Buffer dict records; flush every ``record_limit`` into the repo."""

    def __init__(self, trepo, record_limit: int = 1_000_000, replace: bool = False):
        self.trepo = trepo
        self.record_limit = record_limit
        self.replace = replace
        self._buf: list[dict[str, Any]] = []
        self.record_count = 0
        self.written_count = 0

    def add_record(self, rec: dict[str, Any]) -> None:
        self._buf.append(rec)
        self.record_count += 1
        if len(self._buf) >= self.record_limit:
            self.flush()

    def add_records(self, recs) -> None:
        for r in recs:
            self.add_record(r)

    # reference method names (core.py:478-489)
    def add_to_batch(self, element) -> None:
        self.add_record(element)

    def close(self) -> None:
        self.flush()

    def _to_df(self) -> DataFrame:
        pdf = pd.DataFrame(self._buf)
        # one partition per flush: the buffer is ≤ record_limit rows of
        # DRIVER-resident dicts — createDataFrame would otherwise slice it
        # into defaultParallelism chunks and each flush would schedule ~32
        # near-empty write tasks and land ~32 tiny files (guide §6 small
        # files: paid again by every later read of the table)
        return self.trepo._session().createDataFrame(pdf).coalesce(1)

    def flush(self) -> None:
        if not self._buf:
            return
        df = self._to_df()
        if self.replace:
            self.trepo.replace_records(df)
        else:
            self.trepo.extend(df)
        self.written_count += len(self._buf)
        self._buf = []
        # per-batch counter, reset on every flush (reference _write,
        # core.py:497-505); written_count keeps the cumulative total
        self.record_count = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.flush()
        return False


class FixedRecordWriter(RecordWriter):
    """Records projected to a fixed column set; missing keys → null
    (reference core.py:508-513, test tests/test_writer.py:53-64).

    Accepts either a Spark ``StructType`` (typed projection) or a
    reference-style list of column names (core.py:233-234 passes ``cols``)
    — with a name list the value types are inferred from the buffered
    records, like the reference's pandas path."""

    def __init__(
        self,
        trepo,
        schema: T.StructType | None = None,
        record_limit: int = 1_000_000,
        replace: bool = False,
        cols: list[str] | None = None,
    ):
        super().__init__(trepo, record_limit, replace)
        if schema is None and cols is None:
            raise TypeError("FixedRecordWriter needs a schema or a cols list")
        self.schema = schema
        self._names = list(cols) if cols is not None else [f.name for f in schema.fields]

    def _to_df(self) -> DataFrame:
        # always go through pandas: createDataFrame(pandas, schema) takes
        # the Arrow fast path, while a list of tuples pays per-row Python
        # serialization (~2× the whole flush cost at 16k-row batches).
        # coalesce(1) for the same small-files reason as RecordWriter.
        pdf = pd.DataFrame(self._buf).reindex(columns=self._names)
        if self.schema is not None:
            return self.trepo._session().createDataFrame(pdf, schema=self.schema).coalesce(1)
        return self.trepo._session().createDataFrame(pdf).coalesce(1)


class DfBatchWriter:
    """Buffer DataFrames; flush on close / context exit, or automatically
    after ``max_buffered`` added frames (reference core.py:516-523).

    The reference flushes on buffered *rows* ≥ record_limit, counting
    pandas rows for free (core.py:504-505); a Spark row count is a full
    job per added frame, so ``add_df`` stays job-free here and the
    auto-flush guard is an ADAPTIVE buffered-frame count: it starts at
    ``max_buffered`` and, after each flush, recalibrates to
    ``record_limit / observed-average-rows-per-frame`` — so steady-state
    flush granularity honors ``record_limit`` without ever running a
    count job per add. Row counts are captured during the flush write
    itself via ``observe`` — zero extra jobs — and surface in
    ``written_count``."""

    def __init__(
        self,
        trepo,
        record_limit: int = 1_000_000,
        replace: bool = False,
        max_buffered: int = 32,
    ):
        self.trepo = trepo
        self.record_limit = record_limit
        self.replace = replace
        self.max_buffered = max_buffered
        self._flush_after = max_buffered
        self._bufs: list[DataFrame] = []
        self.written_count = 0

    def add_df(self, df: DataFrame) -> None:
        self._bufs.append(df)
        if len(self._bufs) >= self._flush_after:
            self.flush()

    def flush(self) -> None:
        if not self._bufs:
            return
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        n_frames = len(self._bufs)
        out = self._bufs[0]
        for d in self._bufs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        obs = Observation()
        if self.replace:
            # upsert path: count buffered rows (the merge decides what
            # physically lands)
            out = out.observe(obs, F.count(F.lit(1)).alias("n"))
            self.trepo.replace_records(out)
        else:
            # append path: observe AFTER the write-side filters (null
            # group keys, drop-mode constraints, schema align) so
            # written_count reports rows that actually LANDED, not rows
            # buffered — the adaptive flush trigger recalibrates from it
            prepared = self.trepo._prepare(out).observe(
                obs, F.count(F.lit(1)).alias("n")
            )
            self.trepo._write(prepared, mode="append")
        n_rows = int(obs.get["n"])
        self.written_count += n_rows
        self._bufs = []
        # recalibrate the frame-count trigger from what a frame actually
        # holds, so future auto-flushes approximate the row contract
        avg = max(1, n_rows // max(1, n_frames))
        self._flush_after = max(1, min(self.max_buffered, self.record_limit // avg))

    # reference method names (core.py:478-489); the element is a DataFrame
    def add_to_batch(self, element: DataFrame) -> None:
        self.add_df(element)

    def close(self) -> None:
        self.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.flush()
        return False
