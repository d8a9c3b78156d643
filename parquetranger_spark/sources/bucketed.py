"""Bucketed tables — co-located joins without a shuffle.

No reference counterpart (the reference is single-process pandas; SURVEY
§2.4): this is the Spark-native answer to "join two 100 TB tables on the
same key every day". Both sides are written ``bucketBy(n, key)`` +
``sortBy(key)``; Spark's bucketed scan then feeds a SortMergeJoin with NO
Exchange on either side — the dominant cost of a repeated big-big join
(shuffling both tables every run) is paid once at write time and amortized
over every subsequent join/aggregation on the bucket key.

Bucketing metadata lives in the session catalog (``saveAsTable`` with an
explicit ``path`` → external parquet table), so the files themselves stay
plain partition-free parquet readable by any engine; only the
no-shuffle-join property needs the catalog entry.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..session import active_spark
from .fs import fs_for


def _table_name(root: str) -> str:
    # sanitization is lossy ('/data/t-1' and '/data/t_1' collapse) and the
    # tail truncates, so a content hash of the FULL root disambiguates —
    # distinct roots can never share a catalog entry
    from hashlib import md5

    tail = re.sub(r"[^a-z0-9]+", "_", root.lower()).strip("_")[-60:]
    return f"pqrs_b_{md5(root.encode()).hexdigest()[:10]}_{tail}"


class BucketedRepo:
    """A bucketed external parquet table rooted at ``root_path``.

    ``bucket_cols`` + ``n_buckets`` fix the clustering; every write
    enforces it. Join two BucketedRepos with equal ``n_buckets`` on the
    bucket columns and the plan carries no Exchange on either input
    (asserted in tests/test_bucketed.py).
    """

    def __init__(
        self,
        root_path: str,
        bucket_cols: str | list[str],
        n_buckets: int,
        spark: SparkSession | None = None,
    ):
        # normalize so '/data/t' and '/data/t/' name the same catalog table
        self.main_path = str(root_path).rstrip("/")
        self.bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
        self.n_buckets = int(n_buckets)
        self._spark = spark
        self.table_name = _table_name(self.main_path)

    def _session(self) -> SparkSession:
        return self._spark or active_spark()

    def _writer(self, df: DataFrame, mode: str):
        return (
            df.write.format("parquet")
            .mode(mode)
            .option("path", self.main_path)
            .bucketBy(self.n_buckets, *self.bucket_cols)
            .sortBy(*self.bucket_cols)
        )

    def replace_all(self, df: DataFrame) -> None:
        self._writer(df, "overwrite").saveAsTable(self.table_name)

    def extend(self, df: DataFrame) -> None:
        """Append preserving the bucket layout (each new file set is
        bucketed identically; a bucket's data spans multiple sorted files,
        which keeps the no-shuffle join property — only the per-file sort
        merge gets deeper)."""
        self._writer(df, "append").saveAsTable(self.table_name)

    def get_full_df(self) -> DataFrame:
        """Catalog-backed read — REQUIRED for the bucketed-scan property
        (a plain ``read.parquet`` of the same files is correct but loses
        the bucket metadata and re-shuffles in joins). If the catalog
        entry is missing but the files exist (new session, fresh
        in-memory catalog), the table is re-registered from the path —
        the write-once-join-many story must survive session restarts."""
        self._ensure_registered()
        return self._session().table(self.table_name)

    def _ensure_registered(self) -> None:
        spark = self._session()
        if spark.catalog.tableExists(self.table_name):
            return
        fs = fs_for(self.main_path, spark=spark)
        if not fs.list_files(self.main_path, ".parquet"):
            return  # nothing on disk either — let spark.table raise
        schema = spark.read.parquet(self.main_path).schema
        cols_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        bcols = ", ".join(f"`{c}`" for c in self.bucket_cols)
        spark.sql(
            f"CREATE TABLE {self.table_name} ({cols_ddl}) USING parquet "
            f"CLUSTERED BY ({bcols}) SORTED BY ({bcols}) INTO {self.n_buckets} BUCKETS "
            f"LOCATION '{self.main_path}'"
        )

    def purge(self) -> None:
        spark = self._session()
        spark.sql(f"DROP TABLE IF EXISTS {self.table_name}")
        fs_for(self.main_path, spark=spark).delete(self.main_path)
