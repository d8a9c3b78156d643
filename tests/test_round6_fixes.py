"""Round-6 hardening regressions that fit no feature suite."""

import pytest
from pyspark.sql import functions as F

from parquetranger_spark.sources.table_repo import TableRepo


def test_dv_tombstones_cast_to_canonical_key_types(spark, tmp_root, tmp_path):
    """A dv keys frame handed with the WRONG key type (string vs bigint)
    used to write a tombstone that matched nothing on the batch read and
    crashed the CDF stream's arrow batch builder. The write now casts to
    the canonical key type."""
    t = TableRepo(
        f"{tmp_root}/t", index_cols="k", commit_mode="manifest", spark=spark
    )
    t.extend(spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, s string"))
    t.delete_records_dv(spark.createDataFrame([("1",)], "k string"))
    assert {r.k for r in t.get_full_df().collect()} == {2}

    q = (
        t.stream_changes()
        .writeStream.format("parquet")
        .option("path", f"{tmp_path}/out")
        .option("checkpointLocation", f"{tmp_path}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.read.parquet(f"{tmp_path}/out").collect()
    assert any(r._change_type == "delete" and r.k == 1 for r in rows)


def test_governed_by_call_versioned_read_masks_after_rename(spark, tmp_root):
    """Self-review #2 regression: get_full_df_governed(version=...) on an
    OWNER handle must mask even when the masked column was renamed AFTER
    the snapshot — snapshot-schema binding would surface the pre-rename
    column name and the mask (which names the current column) would
    silently skip it."""
    t = TableRepo(
        f"{tmp_root}/t", index_cols="k", commit_mode="manifest",
        single_writer=True, spark=spark,
    )
    t.extend(spark.createDataFrame([(1, "secret")], "k int, email string"))  # v1
    t.rename_column("email", "contact")
    t.set_policy(column_masks={"contact": "'***'"})
    old = t.get_full_df_governed(version=1)
    assert set(old.columns) == {"k", "contact"}
    assert {r.contact for r in old.collect()} == {"***"}
    # the explicit escape still returns the snapshot shape, ungoverned
    raw = t.get_full_df(version=1)
    assert set(raw.columns) == {"k", "email"}


def test_matview_rescan_survives_source_rename(spark, tmp_root):
    """Self-review #2 regression: a min/max rescan reads the source at a
    pinned version — after a source rename the view's expressions speak
    CURRENT names, so the rescan must NOT bind the snapshot schema."""
    from parquetranger_spark.sources.matview import MaterializedAggView

    src = TableRepo(
        f"{tmp_root}/src", index_cols="k", commit_mode="manifest", spark=spark
    )
    src.extend(
        spark.createDataFrame(
            [(1, "A", 5.0), (2, "A", 9.0), (3, "B", 1.0)], "k int, g string, a double"
        )
    )
    src.rename_column("a", "x")  # view will speak the NEW name
    dest = TableRepo(
        f"{tmp_root}/view", index_cols="g", commit_mode="manifest", spark=spark
    )
    mv = MaterializedAggView(
        src, dest, group_cols=["g"], mins={"min_x": "x"}, maxs={"max_x": "x"}
    )
    mv.refresh()
    # delete the max of group A: forces the exact-rescan path over the
    # pinned source version (which must read with CURRENT names)
    src.delete_records_dv(spark.createDataFrame([(2,)], "k int"))
    mv.refresh()
    got = {(r.g, r.min_x, r.max_x) for r in dest.get_full_df().collect()}
    assert got == {("A", 5.0, 5.0), ("B", 1.0, 1.0)}


def test_ddl_refuses_breaking_generated_expression(spark, tmp_root):
    """Self-review #3 regression: renaming/dropping a column REFERENCED
    by a generated expression is refused (it would brick every later
    write); clearing the generated column first unblocks it."""
    t = TableRepo(
        f"{tmp_root}/t",
        index_cols="k",
        commit_mode="manifest",
        generated_cols={"vsq": "v * v"},
        spark=spark,
    )
    t.extend(spark.createDataFrame([(1, 3.0)], "k int, v double"))
    with pytest.raises(ValueError, match="generated column"):
        t.rename_column("v", "val")
    with pytest.raises(ValueError, match="generated column"):
        t.drop_column("v")
    t.set_table_properties(generated_cols=None)
    t.rename_column("v", "val")
    assert "val" in t.get_full_df().columns


def test_dv_refuses_uncastable_keys(spark, tmp_root):
    """Self-review #5 regression: an uncastable key value must raise, not
    silently NULL into a match-nothing tombstone (the non-ANSI cast
    behavior)."""
    t = TableRepo(
        f"{tmp_root}/t", index_cols="k", commit_mode="manifest", spark=spark
    )
    t.extend(spark.createDataFrame([(1, "a")], "k bigint, s string"))
    with pytest.raises(TypeError, match="do not cast"):
        t.delete_records_dv(
            spark.createDataFrame([("not-a-number",)], "k string")
        )
    assert t.count_rows() == 1
