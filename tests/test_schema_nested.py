"""Nested schema evolution (verdict r5 #6): one level of struct-field
DDL — add / rename / drop / widen a struct member — metadata-only, with
old files mapped to the current shape by NESTED field ids on both the
batch and the streaming read path."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquetranger_spark.sources.table_repo import TableRepo


def _repo(spark, root):
    return TableRepo(
        root, group_cols="g", index_cols="k", commit_mode="manifest", spark=spark
    )


def _v1(spark, rows):
    return spark.createDataFrame(
        rows, "k int, g string, meta struct<w:int, fmt:string>"
    )


def test_nested_add_rename_widen_drop_roundtrip(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_v1(spark, [(1, "A", (640, "png")), (2, "B", None)]))  # epoch 1 files

    t.rename_struct_field("meta", "w", "width")
    t.add_struct_field("meta", "chan", "int", default=3)
    t.alter_struct_field_type("meta", "width", "bigint")

    # new-shape write
    t2 = TableRepo.open(t.main_path, spark=spark)
    t2.extend(
        spark.createDataFrame(
            [(3, "A", (1024, "jpg", 1))],
            "k int, g string, meta struct<width:bigint, fmt:string, chan:int>",
        )
    )

    got = {
        (r.k, None if r.meta is None else (r.meta.width, r.meta.fmt, r.meta.chan))
        for r in t2.get_full_df().collect()
    }
    # old file: w→width (renamed, widened on read), chan → initial default 3;
    # NULL structs stay NULL
    assert got == {(1, (640, "png", 3)), (2, None), (3, (1024, "jpg", 1))}
    f = dict(t2.get_full_df().dtypes)["meta"]
    assert f == "struct<width:bigint,fmt:string,chan:int>"

    # drop: the member disappears everywhere; re-add of the same name is
    # a NEW field — old values must NOT resurrect
    t2.drop_struct_field("meta", "fmt")
    t2.add_struct_field("meta", "fmt", "string")
    got = {
        (r.k, None if r.meta is None else r.meta.fmt)
        for r in t2.get_full_df().collect()
    }
    assert got == {(1, None), (2, None), (3, None)}


def test_nested_ddl_guards(spark, tmp_root):
    t = TableRepo(
        f"{tmp_root}/t", group_cols="g", index_cols="k",
        commit_mode="manifest", spark=spark,
    )
    t.extend(
        spark.createDataFrame(
            [(1, "A", 5.0, (1, "x"))],
            "k int, g string, v double, meta struct<w:int, fmt:string>",
        )
    )
    with pytest.raises(TypeError, match="no struct content"):
        t.add_struct_field("v", "x", "int")
    # key/partition columns are structural — pinned even for nested ops
    with pytest.raises(ValueError, match="key"):
        t.add_struct_field("k", "x", "int")
    with pytest.raises(KeyError):
        t.rename_struct_field("meta", "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.add_struct_field("meta", "W", "int")  # case-insensitive clash
    with pytest.raises(ValueError, match="safe widening"):
        t.alter_struct_field_type("meta", "w", "string")
    t.drop_struct_field("meta", "w")
    with pytest.raises(ValueError, match="last field"):
        t.drop_struct_field("meta", "fmt")
    # governance pins masked struct columns
    t.set_policy(column_masks={"meta": "named_struct('fmt', '*')"})
    with pytest.raises(ValueError, match="masked"):
        t.rename_struct_field("meta", "fmt", "format")
    t.set_policy()


def test_nested_ids_survive_toplevel_rename_chain(spark, tmp_root):
    """Old-file mapping through BOTH a top-level rename and a nested
    rename at once — the id chains compose."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_v1(spark, [(1, "A", (7, "gif"))]))
    t.rename_struct_field("meta", "fmt", "format")
    t.rename_column("meta", "info")
    got = t.get_full_df().select("k", "info.w", "info.format").collect()
    assert [(r[0], r[1], r[2]) for r in got] == [(1, 7, "gif")]


def test_writer_alignment_fills_missing_nested_members(spark, tmp_root):
    """A writer still speaking the pre-add struct shape aligns: the new
    member lands as null (not a failed positional cast)."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_v1(spark, [(1, "A", (1, "x"))]))
    t.add_struct_field("meta", "chan", "int")
    t2 = TableRepo.open(t.main_path, spark=spark)
    t2.extend(_v1(spark, [(9, "B", (9, "y"))]))  # old two-member shape
    got = {
        (r.k, None if r.meta is None else (r.meta.w, r.meta.fmt, r.meta.chan))
        for r in t2.get_full_df().collect()
    }
    assert got == {(1, (1, "x", None)), (9, (9, "y", None))}


@pytest.mark.parametrize("partitioned", [False, True])
def test_nested_evolution_streams_both_flavors(spark, tmp_root, tmp_path, partitioned):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_v1(spark, [(1, "A", (640, "png")), (2, "B", None)]))
    t.rename_struct_field("meta", "w", "width")
    t.add_struct_field("meta", "chan", "int", default=3)
    t2 = TableRepo.open(t.main_path, spark=spark)
    t2.extend(
        spark.createDataFrame(
            [(3, "A", (1024, "jpg", 1))],
            "k int, g string, meta struct<width:int, fmt:string, chan:int>",
        )
    )
    out = f"{tmp_path}/out{int(partitioned)}"
    q = (
        t2.stream_manifest(partitioned=partitioned)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", out + "_ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.k, None if r.meta is None else (r.meta.width, r.meta.fmt, r.meta.chan))
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, (640, "png", 3)), (2, None), (3, (1024, "jpg", 1))}


@pytest.mark.parametrize("stream", [False, True])
def test_pre_id_log_rename_first_keeps_old_values(spark, tmp_root, tmp_path, stream):
    """Self-review regression: on a schema log written BEFORE nested-id
    support (epochs without 'fields'), a rename as the FIRST nested DDL
    must not null out the renamed member in old files. The id backfill
    publishes as its own epoch (name-stable with every pre-id epoch), so
    pre-id commits synthesize their member ids correctly — on the batch
    scan and the streaming reader alike."""
    from parquetranger_spark.plans.schema import as_nullable
    from parquetranger_spark.sources.schema_log import (
        load_schema_log,
        publish_schema_version,
    )

    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_v1(spark, [(1, "A", (640, "png"))]))
    # simulate the pre-nested-id era: publish epoch 1 WITHOUT nested ids
    # (exactly what rounds <6 wrote) and stamp the data against it via a
    # top-level DDL... instead, hand-publish the id-less epoch directly
    fields = [
        {"id": i + 1, "name": f.name, "type": f.dataType.jsonValue()}
        for i, f in enumerate(as_nullable(t.get_full_df().schema).fields)
    ]
    assert publish_schema_version(t._fs(), t.main_path, fields, 1)

    def meta_entry(epoch):
        return next(f for f in epoch["fields"] if f["name"] == "meta")

    assert "fields" not in meta_entry(load_schema_log(t._fs(), t.main_path)[0])

    t.rename_struct_field("meta", "w", "width")  # FIRST nested DDL = rename
    log = load_schema_log(t._fs(), t.main_path)
    # the backfill published as its own epoch: v2 name-stable, v3 renamed
    assert [e["v"] for e in log] == [1, 2, 3]
    assert [n["name"] for n in meta_entry(log[1])["fields"]] == ["w", "fmt"]
    assert [n["name"] for n in meta_entry(log[2])["fields"]] == ["width", "fmt"]

    got = t.get_full_df().select("k", "meta.width", "meta.fmt").collect()
    assert [(r[0], r[1], r[2]) for r in got] == [(1, 640, "png")]

    if stream:
        out = f"{tmp_path}/out"
        q = (
            t.stream_manifest()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", out + "_ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = spark.read.parquet(out).collect()
        assert [(r.k, r.meta.width, r.meta.fmt) for r in rows] == [(1, 640, "png")]


def test_alignment_refuses_unknown_nested_members(spark, tmp_root):
    """Self-review regression: a writer whose struct carries a member
    the canonical schema does not know must FAIL loudly (positional
    casts used to), never silently discard the values."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_v1(spark, [(1, "A", (1, "x"))]))
    t.add_struct_field("meta", "chan", "int")
    bad = spark.createDataFrame(
        [(9, "B", (9, "y", 1, "oops"))],
        "k int, g string, meta struct<w:int, fmt:string, chan:int, rogue:string>",
    )
    with pytest.raises(ValueError, match="rogue"):
        TableRepo.open(t.main_path, spark=spark).extend(bad)
