"""Snapshot↔schema binding (Iceberg semantics): a time-travel read uses
the schema epoch that was CURRENT when the version published — columns
renamed, added, or dropped by LATER DDL read back exactly as they did
then. Current reads, CDF diffs, and governed handles keep the
current-epoch mapping (the policy speaks current names)."""

import pytest
from pyspark.sql import functions as F

from parquetranger_spark.sources.table_repo import TableRepo


def test_time_travel_reads_the_snapshots_schema(spark, tmp_root):
    t = TableRepo(
        f"{tmp_root}/t",
        index_cols="k",
        commit_mode="manifest",
        single_writer=True,
        spark=spark,
    )
    t.extend(spark.createDataFrame([(1, 10, "p")], "k int, a int, b string"))  # v1
    t.rename_column("a", "x")
    t.add_column("c", "string", default="old")
    t.extend(
        spark.createDataFrame([(2, 20, "q", "new")], "k int, x int, b string, c string")
    )  # v2
    t.tag("pin", 2)
    t.drop_column("b")

    # current read: post-drop shape
    cur = t.get_full_df()
    assert set(cur.columns) == {"k", "x", "c"}
    assert {(r.k, r.x, r.c) for r in cur.collect()} == {(1, 10, "old"), (2, 20, "new")}

    # v1 predates every DDL: original names, no later columns
    v1 = t.get_full_df(version=1)
    assert set(v1.columns) == {"k", "a", "b"}
    assert [(r.k, r.a, r.b) for r in v1.collect()] == [(1, 10, "p")]

    # v2 published between the rename/add and the drop: that epoch's
    # shape — v1's rows map INTO it (a→x, c → its initial default)
    v2 = t.get_full_df(version=2)
    assert set(v2.columns) == {"k", "x", "b", "c"}
    assert {(r.k, r.x, r.b, r.c) for r in v2.collect()} == {
        (1, 10, "p", "old"),
        (2, 20, "q", "new"),
    }
    # tags pin the same snapshot-schema read
    assert set(t.get_tagged_df("pin").columns) == {"k", "x", "b", "c"}

    # the CDF diff stays CURRENT-schema on both endpoints — a replica
    # sync must never see two column sets in one feed
    diff = t.changes_between(1, 2)
    assert {"x", "c", "_change_type"} <= set(diff.columns) and "a" not in diff.columns

    # history surfaces the binding: v2 published under the rename+add
    # epoch (v1 predates the schema log — no stamp)
    h = {e["version"]: e["schema_v"] for e in t.history()}
    assert h[1] is None and h[2] == 3


def test_governed_time_travel_keeps_current_shape_and_masks(spark, tmp_root):
    t = TableRepo(
        f"{tmp_root}/t", index_cols="k", commit_mode="manifest",
        single_writer=True, spark=spark,
    )
    t.extend(spark.createDataFrame([(1, "secret")], "k int, email string"))  # v1
    t.rename_column("email", "contact")
    t.extend(spark.createDataFrame([(2, "hush")], "k int, contact string"))  # v2
    t.set_policy(column_masks={"contact": "'***'"})
    g = TableRepo.open(t.main_path, spark=spark, governed=True)
    old = g.get_full_df(version=1)
    # current shape (the mask's name resolves), masked values only
    assert set(old.columns) == {"k", "contact"}
    assert {r.contact for r in old.collect()} == {"***"}
