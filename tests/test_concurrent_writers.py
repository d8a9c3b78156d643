"""Concurrent independent writers on one table root — reference
tests/test_parallel.py:86-94 (two processes appending/widening the same
table under file locks).

The Spark shape needs no locks for appends: every task writes a
uniquely-named immutable file and the commit protocol publishes them, so
two TableRepo instances appending the same root interleave safely — the
final row set is exactly the union. Schema widening is sidecar-only
(atomic rename, last-writer-wins); the one documented restriction (README)
is that two writers must not CREATE a table / widen its schema with
*different* schemas at the same instant — same as the reference, whose
flock only serializes within one machine anyway.
"""

from concurrent.futures import ThreadPoolExecutor

import pandas as pd
import pyarrow.parquet as pq

from parquetranger_spark import TableRepo


def _frame(tag: str, lo: int, n: int = 5, extra: bool = False):
    d = {
        "__index": [f"{tag}{i}" for i in range(lo, lo + n)],
        "A": list(range(lo, lo + n)),
        "C": [str((lo + i) % 3) for i in range(n)],
    }
    if extra:
        d["B"] = [float(i) for i in range(lo, lo + n)]
    return pd.DataFrame(d)


def test_concurrent_independent_appends(spark, tmp_root):
    root = f"{tmp_root}/tab"
    # seed the canonical schema first (concurrent CREATE with different
    # schemas is the documented restriction)
    TableRepo(root, group_cols="C", index_cols="__index", spark=spark).extend(
        spark.createDataFrame(_frame("seed", 0, 1))
    )

    def writer(tag: str):
        # each thread gets its OWN TableRepo instance — independent writers
        t = TableRepo(root, group_cols="C", index_cols="__index", spark=spark)
        for k in range(4):
            t.extend(spark.createDataFrame(_frame(tag, k * 5)))

    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(writer, ["x", "y"]))

    got = (
        TableRepo(root, group_cols="C", index_cols="__index", spark=spark)
        .get_full_df()
        .toPandas()
    )
    want = {f"{t}{i}" for t in "xy" for i in range(20)} | {"seed0"}
    assert set(got["__index"]) == want
    assert len(got) == 41  # no duplicates, no lost appends


def test_concurrent_append_while_widening(spark, tmp_root):
    root = f"{tmp_root}/tab"
    TableRepo(
        root, group_cols="C", index_cols="__index", spark=spark, allow_schema_extension=True
    ).extend(spark.createDataFrame(_frame("seed", 0, 1)))

    def plain_writer():
        t = TableRepo(
            root, group_cols="C", index_cols="__index", spark=spark, allow_schema_extension=True
        )
        for k in range(4):
            t.extend(spark.createDataFrame(_frame("p", k * 5)))

    def widening_writer():
        t = TableRepo(
            root, group_cols="C", index_cols="__index", spark=spark, allow_schema_extension=True
        )
        t.extend(spark.createDataFrame(_frame("w", 0, extra=True)))

    with ThreadPoolExecutor(max_workers=2) as ex:
        f1 = ex.submit(plain_writer)
        f2 = ex.submit(widening_writer)
        f1.result(), f2.result()

    got = (
        TableRepo(root, group_cols="C", index_cols="__index", spark=spark)
        .get_full_df()
        .toPandas()
    )
    # widening never rewrites existing files, so no append can be lost
    assert len(got) == 26
    assert "B" in got.columns
    w_rows = got[got["__index"].str.startswith("w")].sort_values("__index")
    assert w_rows["B"].tolist() == [0.0, 1.0, 2.0, 3.0, 4.0]
    # rows from the non-widening writer read as nulls in the new column
    assert got[got["__index"].str.startswith("p")]["B"].isna().all()


def test_rewrite_to_canonical_materializes_widened_files(spark, tmp_root):
    root = f"{tmp_root}/tab"
    t = TableRepo(
        root, group_cols="C", index_cols="__index", spark=spark, allow_schema_extension=True
    )
    t.extend(spark.createDataFrame(_frame("a", 0)))
    t.extend(spark.createDataFrame(_frame("b", 0, extra=True)))
    # pre-rewrite: the first batch's files lack column B on disk
    assert any("B" not in pq.read_schema(p).names for p in t.paths)
    before = t.get_full_df().toPandas().sort_values("__index").reset_index(drop=True)

    t.rewrite_to_canonical()

    # post-rewrite: every physical file carries the full canonical schema
    assert all("B" in pq.read_schema(p).names for p in t.paths)
    after = t.get_full_df().toPandas().sort_values("__index").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_vacuum_sweeps_only_stale_staging(spark, tmp_path):
    """vacuum removes staging dirs older than the threshold, keeps fresh
    ones (a live append), never touches data, and works through the
    Hadoop FS shim (file:// root) too."""
    import os
    import time

    from parquetranger_spark import TableRepo

    t = TableRepo(str(tmp_path / "t"), group_cols="g", spark=spark)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, g string")
    t.extend(df)
    root = str(tmp_path / "t")
    stale = os.path.join(root, ".pqrs_staging_deadbeef0001")
    fresh = os.path.join(root, ".pqrs_staging_deadbeef0002")
    os.makedirs(stale), os.makedirs(fresh)
    old = time.time() - 7200
    os.utime(stale, (old, old))
    deleted = t.vacuum(max_age_seconds=3600)
    assert deleted == [stale]
    assert not os.path.exists(stale) and os.path.exists(fresh)
    assert t.get_full_df().count() == 2

    # same sweep through the Hadoop client path
    t2 = TableRepo(f"file://{tmp_path}/t2", group_cols="g", spark=spark)
    t2.extend(df)
    local2 = str(tmp_path / "t2" / ".pqrs_staging_cafe00000001")
    os.makedirs(local2)
    os.utime(local2, (old, old))
    deleted2 = t2.vacuum(max_age_seconds=3600)
    assert len(deleted2) == 1 and deleted2[0].endswith(".pqrs_staging_cafe00000001")
    assert not os.path.exists(local2)
    assert t2.get_full_df().count() == 2
