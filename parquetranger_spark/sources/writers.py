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
        self.record_count = 0

    def _to_df(self) -> DataFrame:
        pdf = pd.DataFrame(self._buf)
        return self.trepo._session().createDataFrame(pdf)

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

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.flush()
        return False


class FixedRecordWriter(RecordWriter):
    """Records projected to a fixed schema; missing keys → null
    (reference core.py:508-513, test tests/test_writer.py:53-64)."""

    def __init__(self, trepo, schema: T.StructType, record_limit: int = 1_000_000, replace: bool = False):
        super().__init__(trepo, record_limit, replace)
        self.schema = schema
        self._names = [f.name for f in schema.fields]

    def _to_df(self) -> DataFrame:
        rows = [tuple(r.get(c) for c in self._names) for r in self._buf]
        return self.trepo._session().createDataFrame(rows, schema=self.schema)


class DfBatchWriter:
    """Buffer DataFrames; flush when buffered rows reach ``record_limit``
    (reference core.py:516-523)."""

    def __init__(self, trepo, record_limit: int = 1_000_000, replace: bool = False):
        self.trepo = trepo
        self.record_limit = record_limit
        self.replace = replace
        self._bufs: list[DataFrame] = []
        self._buf_rows = 0
        self.written_count = 0

    def add_df(self, df: DataFrame) -> None:
        self._bufs.append(df)
        self._buf_rows += df.count()
        if self._buf_rows >= self.record_limit:
            self.flush()

    def flush(self) -> None:
        if not self._bufs:
            return
        out = self._bufs[0]
        for d in self._bufs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        if self.replace:
            self.trepo.replace_records(out)
        else:
            self.trepo.extend(out)
        self.written_count += self._buf_rows
        self._bufs, self._buf_rows = [], 0

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
