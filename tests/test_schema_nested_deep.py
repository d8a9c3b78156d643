"""Multi-level nested schema evolution (round-7 verdict #3): struct-in-
struct, array<struct> and map<_, struct> members evolve with the same
metadata-only machinery as one-level members — dotted-path DDL, recursive
field ids, per-element read mapping through higher-order functions on the
batch path and recursive pyarrow rebuilds on both stream flavors."""

import pytest
from pyspark.sql import functions as F

from parquetranger_spark.sources.table_repo import TableRepo


def _repo(spark, root):
    return TableRepo(
        root, group_cols="g", index_cols="k", commit_mode="manifest", spark=spark
    )

V1 = (
    "k int, g string, "
    "frames array<struct<fid:int, tag:string, inner:struct<w:int, r:float>>>, "
    "props map<string, struct<n:int, u:string>>"
)


def _seed(spark):
    return spark.createDataFrame(
        [
            (1, "A", [(1, "x", (10, 2.0)), (2, "y", (11, 3.0))], {"k": (5, "m")}),
            (2, "A", None, None),
        ],
        V1,
    )


def _evolve(t):
    t.rename_struct_field("frames", "tag", "label")
    t.alter_struct_field_type("frames.inner", "w", "bigint")
    t.add_struct_field("props", "score", "double", default=1.5)
    t.drop_struct_field("frames.inner", "r")


def test_deep_ddl_batch_roundtrip(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_seed(spark))
    files_before = sorted(t.paths)
    _evolve(t)
    assert sorted(t.paths) == files_before  # metadata-only, zero rewrite
    got = {r.k: r for r in t.get_full_df().collect()}
    el = got[1].frames[0]
    assert el.label == "x" and el.inner.w == 10
    assert "r" not in el.inner.asDict()
    assert got[1].props["k"].score == 1.5
    assert got[1].props["k"].u == "m"
    assert got[2].frames is None and got[2].props is None  # NULLs stay NULL

    # post-DDL write in the evolved shape
    t.extend(
        spark.createDataFrame(
            [(3, "B", [(7, "z", (20,))], {"z": (9, "cm", 3.3)})],
            "k int, g string, "
            "frames array<struct<fid:int, label:string, inner:struct<w:bigint>>>, "
            "props map<string, struct<n:int, u:string, score:double>>",
        )
    )
    got = {r.k: r for r in t.get_full_df().collect()}
    assert got[3].frames[0].label == "z" and got[3].props["z"].score == 3.3


def test_deep_writer_alignment_fills_missing(spark, tmp_root):
    """A writer still speaking the pre-add deep shape aligns: the added
    two-levels-down member lands as null/absent-default, never a failed
    positional cast."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_seed(spark))
    _evolve(t)
    t2 = TableRepo.open(t.main_path, spark=spark)
    t2.extend(
        spark.createDataFrame(
            [(9, "B", [(8, "q", (30,))], {"w": (1, "kg")})],  # props lacks score
            "k int, g string, "
            "frames array<struct<fid:int, label:string, inner:struct<w:bigint>>>, "
            "props map<string, struct<n:int, u:string>>",
        )
    )
    got = {r.k: r for r in t2.get_full_df().collect()}
    assert got[9].props["w"].score is None


def test_deep_drop_then_readd_isolation(spark, tmp_root):
    """Drop-then-readd TWO levels down: the re-added name is a NEW field
    id, so old rows read null — no value resurrection."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_seed(spark))
    t.drop_struct_field("frames.inner", "r")
    t.add_struct_field("frames.inner", "r", "float")
    got = {r.k: r for r in t.get_full_df().collect()}
    assert got[1].frames[0].inner.r is None
    assert got[1].frames[0].inner.w == 10  # untouched sibling intact


def test_deep_time_travel_binds_old_shape(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_seed(spark))
    _evolve(t)
    v1 = {r.k: r for r in t.get_full_df(version=1).collect()}
    el = v1[1].frames[0]
    assert el.tag == "x" and el.inner.r == 2.0  # pre-DDL names and members


def test_deep_ddl_guards(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_seed(spark))
    with pytest.raises(KeyError, match="no member"):
        t.add_struct_field("frames.nope", "x", "int")
    with pytest.raises(TypeError, match="no struct content"):
        t.add_struct_field("frames.fid", "x", "int")
    with pytest.raises(ValueError, match="already exists"):
        t.add_struct_field("frames.inner", "W", "int")  # case-insensitive
    with pytest.raises(ValueError, match="safe widening"):
        t.alter_struct_field_type("frames.inner", "w", "string")


@pytest.mark.parametrize("cdf", [False, True])
@pytest.mark.parametrize("partitioned", [False, True])
def test_deep_evolution_streams_both_flavors(spark, tmp_root, tmp_path, cdf, partitioned):
    """Both stream flavors × both reader paths (driver-python simple and
    one-task-per-file ARROW — the arrow rebuild is where a dropped map
    null mask would resurrect NULL maps as empty ones)."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_seed(spark))
    _evolve(t)
    t.extend(
        spark.createDataFrame(
            [(3, "B", [(7, "z", (20,))], {"z": (9, "cm", 3.3)})],
            "k int, g string, "
            "frames array<struct<fid:int, label:string, inner:struct<w:bigint>>>, "
            "props map<string, struct<n:int, u:string, score:double>>",
        )
    )
    out = f"{tmp_path}/out{int(cdf)}_{int(partitioned)}"
    src = (
        t.stream_changes(partitioned=partitioned)
        if cdf
        else t.stream_manifest(partitioned=partitioned)
    )
    q = (
        src.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", out + "_ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    df = spark.read.parquet(out)
    if cdf:
        df = df.where("_change_type = 'insert'")
    got = {r.k: r for r in df.collect()}
    el = got[1].frames[0]
    assert el.label == "x" and el.inner.w == 10
    assert got[1].props["k"].score == 1.5
    assert got[2].frames is None and got[2].props is None
    assert got[3].props["z"].score == 3.3
