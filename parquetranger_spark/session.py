"""SparkSession factory tuned for the local[{N}] test/bench environment.

At cluster scale the session is owned by the platform; every knob here is
either harmless under a real cluster (AQE, Arrow) or local-only
(driver memory). Nothing in the library itself ever *creates* a session —
all operators accept or discover the active one — so the engine drops into
an existing 1000-executor deployment unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "parquetranger-spark") -> SparkSession:
    """Build (or reuse) a local session with sane analytics defaults.

    - ``spark.sql.shuffle.partitions`` = local cores (not the 200 default);
      under AQE this is only the initial value — runtime coalescing adapts.
    - AQE on: runtime re-planning, partition coalescing, skew-join splitting.
    - Arrow on: vectorized pandas interchange for applyInPandas/pandas_udf.
    - UTC session timezone: keeps timestamp semantics aligned with the
      DuckDB oracle (naive-UTC) and makes epoch math engine-independent.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Default to py4j's CLASSIC pooled gateway, not pinned-thread mode
    # (round-9 soak forensics; overridable by exporting PYSPARK_PIN_THREAD
    # before the JVM launches). Pinned mode binds each Python thread to
    # ONE socket; a JavaObject finalizer firing while that thread sits
    # between send and receive inside ``send_command`` (cyclic GC can run
    # on any allocation, e.g. readline's) writes a nested MEMORY_DEL into
    # the middle of the same stream and desynchronizes it — both sides
    # then wait forever. py4j documents the hazard (``auto_gc``,
    # clientserver.py) but defaults the guard off. The classic
    # GatewayClient checks every command out of a CONNECTION POOL, so a
    # finalizer mid-call borrows a DIFFERENT socket and the interleave
    # cannot happen — which is why multithreaded drivers (concurrent
    # TableRepo writers, batch writer pools) were stable for a decade
    # before pinned mode became the default. Engine code does not use
    # per-thread local properties, so pinned mode buys nothing here.
    os.environ.setdefault("PYSPARK_PIN_THREAD", "false")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def active_spark(df=None) -> SparkSession:
    """Resolve the session to use: the one behind ``df`` if given, else the
    active session. Library code uses this instead of building its own."""
    if df is not None:
        return df.sparkSession
    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("no active SparkSession; create one first")
    return s
