"""TableRepo.open(): reopen a table from its persisted configuration —
the catalog-table-properties shape (no reference counterpart; the
reference re-states constructor args in every process)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parquetranger_spark.functions.hashing import HashPartitioner
from parquetranger_spark.sources.table_repo import TableRepo


def test_open_reconstructs_manifest_table(spark, tmp_root):
    t = TableRepo(
        tmp_root + "/t",
        group_cols="g",
        index_cols="k",
        commit_mode="manifest",
        stats_cols="v",
        cluster_by="v",
        max_records=100,
        compression="zstd",
        spark=spark,
    )
    t.extend(
        spark.createDataFrame(
            [Row(k=i, g=f"g{i % 2}", v=float(i)) for i in range(10)]
        )
    )
    o = TableRepo.open(tmp_root + "/t", spark=spark)
    assert o.group_cols == ["g"] and o.index_cols == ["k"]
    assert o.commit_mode == "manifest" and o.stats_cols == ["v"]
    assert o.cluster_by == ["v"] and o.max_records == 100
    assert o.compression == "zstd"
    # the reopened handle operates the table end-to-end
    o.replace_records(spark.createDataFrame([Row(k=3, g="g1", v=99.0)]))
    rows = {r.k: r.v for r in o.get_full_df().collect()}
    assert rows[3] == 99.0 and len(rows) == 10
    # stats kept riding commits through the reopened handle
    kept, total = o.skip_plan([("v", ">=", 99.0)])
    assert kept < total


def test_open_hash_partitioner_roundtrip(spark, tmp_root):
    t = TableRepo(
        tmp_root + "/h",
        group_cols=HashPartitioner("k", 8),
        index_cols="k",
        spark=spark,
    )
    t.extend(spark.createDataFrame([Row(k=str(i), v=i) for i in range(50)]))
    o = TableRepo.open(tmp_root + "/h", spark=spark)
    assert o.partitioner is not None and o.partitioner.num_groups == 8
    n0 = o.get_full_df().count()
    o.extend(spark.createDataFrame([Row(k="x", v=1)]))
    assert o.get_full_df().count() == n0 + 1


def test_open_overrides_and_missing(spark, tmp_root):
    t = TableRepo(tmp_root + "/t2", group_cols="g", spark=spark)
    t.extend(spark.createDataFrame([Row(g="a", v=1)]))
    o = TableRepo.open(tmp_root + "/t2", spark=spark, single_writer=True)
    assert o.single_writer and o.group_cols == ["g"]
    with pytest.raises(FileNotFoundError):
        TableRepo.open(tmp_root + "/nope", spark=spark)


def test_governance_policy_roundtrip(spark, tmp_root):
    t = TableRepo(tmp_root + "/gov", commit_mode="manifest", spark=spark)
    t.extend(
        spark.createDataFrame(
            [Row(k=i, email=f"u{i}@x.io", seg=("A" if i % 2 else "B"), v=float(i)) for i in range(6)]
        )
    )
    t.set_policy(
        row_filter="seg = 'A'",
        column_masks={"email": "concat('***', substring(email, instr(email, '@')))"},
    )
    # policy travels with the sidecar: a reopened handle enforces it
    o = TableRepo.open(tmp_root + "/gov", spark=spark)
    got = {r.k: (r.email, r.seg) for r in o.get_full_df_governed().collect()}
    assert set(got) == {1, 3, 5}
    assert all(e == "***@x.io" for e, _ in got.values())
    # ungoverned read unchanged; clearing restores full surface
    assert o.get_full_df().count() == 6
    t.set_policy()
    assert o.get_full_df_governed().count() == 6
    with pytest.raises(KeyError):
        t.set_policy(column_masks={"nope": "1"})
    # NULL-evaluating row filter drops the row (unknown is not visible)
    t.set_policy(row_filter="CASE WHEN k < 2 THEN NULL ELSE true END")
    assert t.get_full_df_governed().count() == 4


def test_set_table_properties(spark, tmp_root):
    t = TableRepo(tmp_root + "/p", commit_mode="manifest", spark=spark)
    t.extend(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(200)]))
    t.set_table_properties(stats_cols="v", cluster_by="v", max_records=50)
    assert t.stats_cols == ["v"] and t.cluster_by == ["v"]
    # this handle AND a reopened one both honor the new properties
    t.extend(
        spark.range(200, 400).select(
            F.col("id").alias("k"), F.col("id").cast("double").alias("v")
        )
    )
    kept, total = t.skip_plan([("v", ">=", 399.0)])
    assert kept < total  # stats recorded for the post-change commit
    o = TableRepo.open(tmp_root + "/p", spark=spark)
    assert o.stats_cols == ["v"] and o.max_records == 50
    # reset to default DROPS the persisted value
    t.set_table_properties(max_records=0)
    assert TableRepo.open(tmp_root + "/p", spark=spark).max_records == 0
    with pytest.raises(ValueError):
        t.set_table_properties(group_cols=["v"])  # structural -> refused
    with pytest.raises(ValueError):
        t.set_table_properties(cluster_algo="hilbert")


def test_ddl_refuses_masked_column(spark, tmp_root):
    t = TableRepo(tmp_root + "/m", commit_mode="manifest", spark=spark)
    t.extend(spark.createDataFrame([Row(k=1, email="a@b.c")]))
    t.set_policy(column_masks={"email": "'***'"})
    with pytest.raises(ValueError, match="governance"):
        t.rename_column("email", "mail")
    with pytest.raises(ValueError, match="governance"):
        t.drop_column("email")
    t.set_policy()  # clear -> DDL proceeds
    t.rename_column("email", "mail")
    assert "mail" in t.get_full_df().columns
