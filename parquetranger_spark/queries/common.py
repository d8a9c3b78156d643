"""Shared helpers for declared queries and their DuckDB oracles."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def dsum(col: str | Column, alias: str) -> Column:
    """Exact (decimal-routed) sum of a double column, surfaced as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def dsum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) AS {alias}"


def dmean(col: str | Column, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def dmean_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS {alias}"


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet has stored TIMESTAMP(NANOS) in some testdata
    # generations (which Spark's parquet reader rejects without this flag)
    # and TIMESTAMP(MICROS) in others; read nanos as epoch-nanos long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    if table == "events":
        # engine-wide convention: events.ts is epoch-nanos long (exact
        # integer arithmetic for bucketing/as-of/range logic; the DuckDB
        # oracles use epoch_ns(ts), unit-independent). Normalize a
        # micros-timestamp generation to the same convention: NTZ wall
        # clock → UTC instant (session TZ is UTC) → nanos.
        from pyspark.sql.types import TimestampNTZType, TimestampType

        if isinstance(df.schema["ts"].dataType, (TimestampType, TimestampNTZType)):
            df = df.withColumn(
                "ts",
                (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("long"),
            )
    return df


def scratch_dir(name: str) -> str:
    return tempfile.mkdtemp(prefix=f"pqrs_{name}_")


def md5_mod_sql(expr: str, num_groups: int) -> str:
    """DuckDB expression for int(md5(x),16) % n via the same base-2^32
    chunk fold the engine uses (functions/hashing.py)."""
    acc = "CAST(0 AS BIGINT)"
    h = f"md5(CAST({expr} AS VARCHAR))"
    for i in range(4):
        chunk = f"CAST(concat('0x', substr({h}, {1 + 8 * i}, 8)) AS BIGINT)"
        acc = f"(({acc}) * 4294967296 + {chunk}) % {num_groups}"
    return f"({acc})"


_DIM_CACHE: dict[str, int] = {}


def embedding_dim(sf_dir: str, table: str = "embeddings", col: str = "embedding") -> int:
    """Embedding dimensionality for a local parquet table, read driver-side
    from ONE one-row pyarrow batch — no Spark job (the ANN operators would
    otherwise run a tiny ``select(size(col)).first()`` job per call just to
    size their hyperplanes). Cached per path; local-path queries only (the
    declared-query contract — operators still self-discover when callers
    pass nothing)."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    if path not in _DIM_CACHE:
        import pyarrow.parquet as pq

        batch = next(pq.ParquetFile(path).iter_batches(batch_size=1, columns=[col]))
        _DIM_CACHE[path] = len(batch.column(0)[0])
    return _DIM_CACHE[path]


# Per-query index-BUILD seconds, recorded by queries that construct a
# persisted ANN index inside their timed body (round-7 verdict #6:
# bench attribution must split one-off build cost from the serve path,
# so serve-only numbers stay comparable across rounds). bench.py pops
# entries after each run and emits ann_build_s / ann_serve_s.
BUILD_S: dict[str, float] = {}


def record_build(name: str, seconds: float) -> None:
    BUILD_S[name] = round(seconds, 3)
