"""Round-8 advice fixes: empty-map rows through the simple stream
reader (declared-type conversion, not tuple sniffing), map KEY-type
alignment in plans/schema, nested col_types transport (comma-safe),
and the WebHDFS stub's RENAME destination path-escape 403."""

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from parquetranger_spark import TableRepo


def _mk(spark, root, **kw):
    return TableRepo(
        root, index_cols="k", commit_mode="manifest", spark=spark, **kw
    )


def _map_df(spark):
    # row 1: populated map, row 2: EMPTY (non-null) map, row 3: null map
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
        ]
    )
    return spark.createDataFrame(
        [("a", {"x": 1, "y": 2}), ("b", {}), ("c", None)], schema
    )


def test_stream_manifest_empty_map_rows(spark, tmp_root, tmp_path):
    """An empty non-null map used to come back from to_pylist as [] and
    stay a list, crashing Spark's MapType row conversion in the simple
    stream reader. Declared-type conversion must round-trip all three
    shapes (populated / empty / null)."""
    t = _mk(spark, f"{tmp_root}/t")
    t.extend(_map_df(spark))
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ckpt"
    q = (
        t.stream_manifest()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["k"]: r["m"] for r in spark.read.parquet(out).collect()}
    assert got["a"] == {"x": 1, "y": 2}
    assert got["b"] == {}
    assert got["c"] is None


def test_stream_changes_map_after_nested_types(spark, tmp_root, tmp_path):
    """col_types transport: a nested simpleString contains commas
    (map<string,bigint>), which misaligned the comma-split types list
    for every LATER column — partition-value casting then used the
    wrong type. schema_json now drives the declared types."""
    t = TableRepo(
        f"{tmp_root}/t",
        group_cols="g",
        index_cols="k",
        commit_mode="manifest",
        spark=spark,
    )
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
            T.StructField("g", T.LongType()),  # partition col AFTER the map
        ]
    )
    t.extend(
        spark.createDataFrame([("a", {"x": 1}, 1), ("b", {}, 2)], schema)
    )
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ckpt"
    q = (
        t.stream_manifest()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r["k"], r["m"], r["g"]) for r in spark.read.parquet(out).collect()
    )
    assert got == [("a", {"x": 1}, 1), ("b", {}, 2)]
    # partition col typed long (not string) proves the types aligned
    assert dict(spark.read.parquet(out).dtypes)["g"] == "bigint"


def test_align_map_key_type_cast(spark):
    """_align_expr: a map whose KEY type differs from canonical must be
    re-keyed, not passed through misaligned."""
    from parquetranger_spark.plans.schema import _align_expr

    src = T.MapType(T.IntegerType(), T.LongType())
    tgt = T.MapType(T.LongType(), T.LongType())
    df = spark.createDataFrame(
        [({1: 10},)], T.StructType([T.StructField("m", src)])
    )
    out = df.select(_align_expr(F.col("m"), src, tgt, "m").alias("m"))
    assert out.schema["m"].dataType == tgt
    assert out.collect()[0]["m"] == {1: 10}


def test_align_map_key_struct_rename(spark):
    """Struct-typed map keys align member-wise through the same path."""
    from parquetranger_spark.plans.schema import _align_expr

    src = T.MapType(
        T.StructType([T.StructField("a", T.IntegerType())]), T.LongType()
    )
    tgt = T.MapType(
        T.StructType([T.StructField("a", T.LongType())]), T.LongType()
    )
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1]})
    ).select(
        F.map_from_arrays(
            F.array(F.struct(F.lit(1).cast("int").alias("a"))),
            F.array(F.lit(5).cast("long")),
        ).alias("m")
    )
    out = df.select(_align_expr(F.col("m"), src, tgt, "m").alias("m"))
    assert out.schema["m"].dataType == tgt
    got = out.collect()[0]["m"]
    assert list(got.values()) == [5] and list(got.keys())[0]["a"] == 1


def test_webhdfs_rename_destination_escape_403(tmp_path):
    """RENAME with a path-escaping destination must 403 like the
    source-path escape, not crash with an unhandled 500."""
    import urllib.error
    import urllib.request

    from parquetranger_spark.testing.webhdfs_stub import WebHdfsStub

    with WebHdfsStub(str(tmp_path / "store")) as uri:
        url = "http://" + uri.split("://", 1)[1]
        # create a file to rename
        req = urllib.request.Request(
            f"{url}/webhdfs/v1/f?op=CREATE&datanode=1&overwrite=true",
            data=b"x",
            method="PUT",
        )
        urllib.request.urlopen(req)
        bad = urllib.request.Request(
            f"{url}/webhdfs/v1/f?op=RENAME&destination=../../etc/pwned",
            method="PUT",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 403


def test_stream_px_auto_flavor(spark, tmp_root):
    """Round-8: stream flavor AUTO-selection — fat committed entries
    flip the default to the executor-side partitioned reader; explicit
    choices always win."""
    import pandas as pd

    # rowcount-aware table (stats_cols records per-file rowcounts)
    t = _mk(spark, f"{tmp_root}/t", stats_cols="v")
    t.extend(
        spark.createDataFrame(
            pd.DataFrame({"k": [f"k{i}" for i in range(12)], "v": range(12)})
        ).coalesce(1)
    )
    # thin history: simple reader
    assert t._stream_px_auto(None) is False
    # explicit wins both ways
    assert t._stream_px_auto(True) is True
    assert t._stream_px_auto(False) is False
    # the same history IS fat under a tiny threshold (the decision is
    # threshold-driven, not shape-driven)
    assert t._stream_px_auto(None, threshold_rows=10) is True
    # a genuinely fat commit flips the DEFAULT threshold
    big = spark.range(100_000).select(
        F.concat(F.lit("x"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    t.extend(big)
    assert t._stream_px_auto(None) is True
    # tables without rowcounts fall back to per-entry file count
    t2 = _mk(spark, f"{tmp_root}/t2")
    t2.extend(
        spark.createDataFrame(
            pd.DataFrame({"k": [f"k{i}" for i in range(80)], "v": range(80)})
        ).repartition(40)
    )
    assert t2._stream_px_auto(None) is True
    assert t2._stream_px_auto(None, threshold_files=64) is False
