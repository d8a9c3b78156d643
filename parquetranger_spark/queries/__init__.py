"""Declared-query registry: every operator from SURVEY.md §2 registers a
(spark, sf_dir) -> DataFrame callable plus (when SQL-expressible) a DuckDB
oracle string. ``__spark_entry__.py`` re-exports the registry to the driver.

Exactness rules (so the driver's order-insensitive value hash matches
bit-for-bit):

- sums of non-integer doubles go through ``DECIMAL(28,6)`` in BOTH engines
  (decimal addition is exact and associative; the final cast-to-double of
  the same decimal yields the same bits regardless of engine);
- means are computed as ``CAST(decimal_sum AS DOUBLE) / count`` — one
  double division of identical operands;
- timestamps never surface raw: they are bucketed via epoch seconds
  (TZ-independent) and session TZ is pinned to UTC inside each query since
  the test parquet stores naive timestamps;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run.

    Imports are UNGUARDED on purpose: a broken import must fail the
    entry point loudly — an ``except ImportError: pass`` here once meant
    a refactor typo could silently delete an entire query tier from the
    registry while the gate kept printing N/N passed over the shrunken
    set and the bench read as a massive speedup."""
    from . import (  # noqa: F401
        compute,
        curation,
        ingestion,
        pipeline,
        sketches,
        storage,
        tpch,
    )
