"""partition_values() is metadata-only (verdict r5 #3): in manifest mode
the answer comes from the manifest's own file index — zero data files
opened, zero directory listings; in files mode from one listing. The
scan remains the fallback for non-partition columns, dv-bearing tables,
and governed handles."""

import pytest
from pyspark.sql import functions as F

from parquetranger_spark.sources import fs as fsmod
from parquetranger_spark.sources.table_repo import TableRepo


def _no_scan(monkeypatch):
    def boom(self, *a, **k):
        raise AssertionError("partition_values opened a data scan")

    monkeypatch.setattr(TableRepo, "_get_full_df_raw", boom)


def test_manifest_mode_zero_scan_zero_listing(spark, tmp_root, monkeypatch):
    t = TableRepo(
        f"{tmp_root}/t",
        group_cols="g",
        index_cols="k",
        commit_mode="manifest",
        spark=spark,
    )
    t.extend(
        spark.createDataFrame(
            [(1, 3, 1.0), (2, 7, 2.0), (3, 3, 3.0), (4, 11, 4.0)],
            "k int, g int, v double",
        )
    )
    expect = sorted(r[0] for r in t.get_full_df().select("g").distinct().collect())

    _no_scan(monkeypatch)
    monkeypatch.setattr(
        fsmod.LocalFS,
        "list_files",
        lambda self, *a, **k: (_ for _ in ()).throw(
            AssertionError("partition_values listed the tree")
        ),
    )
    got = t.partition_values()
    assert sorted(got) == expect == [3, 7, 11]
    # typed like the scan's answer, not hive-path strings
    assert all(isinstance(v, int) for v in got)


def test_files_mode_one_listing_no_scan(spark, tmp_root, monkeypatch):
    t = TableRepo(f"{tmp_root}/t", group_cols="g", index_cols="k", spark=spark)
    t.extend(
        spark.createDataFrame(
            [(1, "x y", 1.0), (2, "p%q", 2.0), (3, "x y", 3.0)],
            "k string, g string, v double",
        )
    )
    expect = sorted(r[0] for r in t.get_full_df().select("g").distinct().collect())
    _no_scan(monkeypatch)
    # hive-path escaping (space, percent) must round-trip
    assert sorted(t.partition_values()) == expect == ["p%q", "x y"]


def test_fallbacks_take_the_scan(spark, tmp_root):
    t = TableRepo(
        f"{tmp_root}/t",
        group_cols="g",
        index_cols="k",
        commit_mode="manifest",
        spark=spark,
    )
    t.extend(
        spark.createDataFrame(
            [(1, "A", 1.0), (2, "B", 2.0)], "k int, g string, v double"
        )
    )
    # non-partition column: scan distinct
    assert sorted(t.partition_values("v")) == [1.0, 2.0]
    # a dv that empties partition B: the paths still show B, the scan
    # must be consulted and must NOT return it
    t.delete_records_dv(spark.createDataFrame([(2,)], "k int"))
    assert t.partition_values() == ["A"]


def test_date_partitions_typed(spark, tmp_root, monkeypatch):
    import datetime as dt

    t = TableRepo(
        f"{tmp_root}/t",
        group_cols="d",
        index_cols="k",
        commit_mode="manifest",
        spark=spark,
    )
    t.extend(
        spark.createDataFrame(
            [(1, dt.date(2026, 1, 2)), (2, dt.date(2026, 3, 4))], "k int, d date"
        )
    )
    expect = sorted(r[0] for r in t.get_full_df().select("d").distinct().collect())
    _no_scan(monkeypatch)
    got = t.partition_values()
    assert sorted(got) == expect
    assert all(isinstance(v, dt.date) for v in got)
