"""MERGE with schema evolution (round-7 verdict #5): merge_schema=True
adds source-only columns and nested struct members through the schema
epoch log before the merge — metadata-only; pre-merge rows surface typed
nulls. Without the flag, top-level extras drop (documented) and unknown
nested members raise (alignment's loud rule)."""

import pytest
from pyspark.sql import functions as F

from parquetranger_spark.sources.table_repo import TableRepo


def _repo(spark, root, **kw):
    return TableRepo(
        root, group_cols="g", index_cols="k", commit_mode="manifest",
        spark=spark, **kw,
    )


def test_merge_schema_adds_top_level(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame([(1, "A", 1.0), (2, "B", 2.0)], "k int, g string, v double"))
    files_before = sorted(t.paths)
    src = spark.createDataFrame(
        [(2, "B", 20.0, "tag2"), (3, "B", 30.0, "tag3")],
        "k int, g string, v double, note string",
    )
    t.merge(src, update="all", insert=True, merge_schema=True)
    got = {r.k: (r.v, r.note) for r in t.get_full_df().collect()}
    assert got == {1: (1.0, None), 2: (20.0, "tag2"), 3: (30.0, "tag3")}
    # partition A was untouched by the merge: its file survived unchanged
    assert any(p in files_before for p in t.paths)


def test_merge_schema_adds_nested_member(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(
        spark.createDataFrame(
            [(1, "A", (640, "png"))],
            "k int, g string, meta struct<w:int, fmt:string>",
        )
    )
    src = spark.createDataFrame(
        [(1, "A", (800, "jpg", 3)), (2, "B", (100, "gif", 1))],
        "k int, g string, meta struct<w:int, fmt:string, chan:int>",
    )
    t.merge(src, update="all", insert=True, merge_schema=True)
    got = {r.k: r.meta for r in t.get_full_df().collect()}
    assert got[1].chan == 3 and got[2].chan == 1
    # and WITHOUT the flag, an unknown nested member still raises loudly
    src2 = spark.createDataFrame(
        [(9, "A", (1, "x", 1, 9.9))],
        "k int, g string, meta struct<w:int, fmt:string, chan:int, depth:double>",
    )
    with pytest.raises(ValueError, match="unknown to"):
        t.merge(src2, update="all", insert=True)


def test_merge_schema_requires_manifest(spark, tmp_root):
    t = TableRepo(f"{tmp_root}/plain", group_cols="g", index_cols="k", spark=spark)
    t.extend(spark.createDataFrame([(1, "A", 1.0)], "k int, g string, v double"))
    with pytest.raises(TypeError, match="manifest"):
        t.merge(
            spark.createDataFrame([(1, "A", 2.0, "x")], "k int, g string, v double, n string"),
            merge_schema=True,
        )


def test_merge_schema_time_travel_pre_evolution(spark, tmp_root):
    """The pre-merge snapshot still reads with its own (pre-add) shape."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame([(1, "A", 1.0)], "k int, g string, v double"))
    t.merge(
        spark.createDataFrame([(2, "B", 2.0, "x")], "k int, g string, v double, note string"),
        update="all",
        insert=True,
        merge_schema=True,
    )
    assert "note" not in t.get_full_df(version=1).columns
    assert "note" in t.get_full_df().columns
