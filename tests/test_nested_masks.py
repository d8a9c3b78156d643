"""Round-8 nested column masks (verdict #3): set_policy binds masks to
DOTTED nested paths (struct members, through array/map containers),
masked reads rewrite the member in place on every surface, and nested
DDL refuses to move a masked path while siblings stay evolvable."""

import pyspark.sql.functions as F
import pytest

from parquetranger_spark import TableRepo


def _tbl(spark, root):
    t = TableRepo(root, index_cols="k", commit_mode="manifest", spark=spark)
    df = spark.createDataFrame(
        [
            (1, "A", ("a@x.io", "NYC"), [("t1", "a@x.io")]),
            (2, "B", ("b@x.io", "LA"), [("t2", "b@x.io"), ("t3", "c@x.io")]),
            (3, "H", None, []),
        ],
        "k int, seg string, "
        "props struct<email string, city string>, "
        "tags array<struct<label string, email string>>",
    )
    t.extend(df)
    return t


RAW = {"a@x.io", "b@x.io", "c@x.io"}


def _no_raw(obj):
    if obj is None:
        return True
    if isinstance(obj, str):
        return obj not in RAW
    if isinstance(obj, (list, tuple)):
        return all(_no_raw(e) for e in obj)
    if hasattr(obj, "asDict"):
        return _no_raw(list(obj.asDict().values()))
    if isinstance(obj, dict):
        return _no_raw(list(obj.values()))
    return True


def test_nested_mask_batch_read(spark, tmp_root):
    t = _tbl(spark, f"{tmp_root}/t")
    t.set_policy(
        column_masks={"props.email": "'***'", "tags.email": "'***'"}
    )
    g = TableRepo.open(t.main_path, spark=spark, governed=True)
    rows = {r["k"]: r for r in g.get_full_df().collect()}
    assert rows[1]["props"]["email"] == "***"
    assert rows[1]["props"]["city"] == "NYC"  # sibling untouched
    assert [e["email"] for e in rows[2]["tags"]] == ["***", "***"]
    assert [e["label"] for e in rows[2]["tags"]] == ["t2", "t3"]
    assert rows[3]["props"] is None  # NULL struct stays NULL
    assert rows[3]["tags"] == []  # empty array stays empty
    assert all(_no_raw(r) for r in rows.values())
    # owner handle still reads raw
    assert t.get_full_df().where("props.email = 'a@x.io'").count() == 1


def test_nested_mask_row_context_expr(spark, tmp_root):
    """Mask expressions are ROW-context (may reference other columns),
    like top-level masks."""
    t = _tbl(spark, f"{tmp_root}/t")
    t.set_policy(column_masks={"props.email": "concat('*', seg)"})
    g = TableRepo.open(t.main_path, spark=spark, governed=True)
    rows = {r["k"]: r for r in g.get_full_df().collect()}
    assert rows[1]["props"]["email"] == "*A"
    assert rows[2]["props"]["email"] == "*B"


def test_nested_mask_streams_masked(spark, tmp_root, tmp_path):
    t = _tbl(spark, f"{tmp_root}/t")
    t.set_policy(column_masks={"props.email": "'***'", "tags.email": "'***'"})
    g = TableRepo.open(t.main_path, spark=spark, governed=True)
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ck"
    q = (
        g.stream_manifest()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out).collect()
    assert len(got) == 3 and all(_no_raw(r) for r in got)


def test_nested_mask_cdc_replica_masked(spark, tmp_root, tmp_path):
    t = _tbl(spark, f"{tmp_root}/src")
    t.set_policy(column_masks={"props.email": "'***'", "tags.email": "'***'"})
    g = TableRepo.open(t.main_path, spark=spark, governed=True)
    repl = TableRepo(
        f"{tmp_root}/repl", index_cols="k", commit_mode="manifest", spark=spark
    )
    repl.sync_from(g, checkpoint=f"{tmp_path}/ck")
    got = repl.get_full_df().collect()
    assert len(got) == 3 and all(_no_raw(r) for r in got)


def test_nested_mask_pins_ddl_path_precisely(spark, tmp_root):
    t = _tbl(spark, f"{tmp_root}/t")
    t.set_policy(column_masks={"props.email": "'***'"})
    # the masked member may not move
    with pytest.raises(ValueError, match="masked"):
        t.rename_struct_field("props", "email", "mail")
    with pytest.raises(ValueError, match="masked"):
        t.drop_struct_field("props", "email")
    with pytest.raises(ValueError, match="masked"):
        t.alter_struct_field_type("props", "email", "string")
    # nor its ANCESTOR column (rename/drop of props orphans the binding)
    with pytest.raises(ValueError, match="masked"):
        t.rename_column("props", "attrs")
    with pytest.raises(ValueError, match="masked"):
        t.drop_column("props")
    # SIBLINGS stay evolvable
    t.rename_struct_field("props", "city", "town")
    t.add_struct_field("props", "zip", "string")
    # and clearing the policy unpins
    t.set_policy(row_filter=None, column_masks=None)
    t.rename_struct_field("props", "email", "mail")
    assert "mail" in [
        f.name for f in t.get_full_df().schema["props"].dataType.fields
    ]


def test_nested_mask_validation_at_set_time(spark, tmp_root):
    t = _tbl(spark, f"{tmp_root}/t")
    with pytest.raises(KeyError, match="no nested field"):
        t.set_policy(column_masks={"props.phone": "'***'"})
    with pytest.raises(KeyError, match="no nested field"):
        t.set_policy(column_masks={"seg.email": "'***'"})
    with pytest.raises(ValueError, match="does not analyze"):
        t.set_policy(column_masks={"props.email": "concat(nope, 'x')"})
