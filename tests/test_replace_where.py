"""REPLACE WHERE (round 10): atomically replace exactly the predicate
region with an incoming frame in ONE committed version —
TableRepo.replace_where plus the SQL front door's
``INSERT INTO t REPLACE WHERE <pred> <query>`` and Delta's
DESCRIBE HISTORY observability face."""

import pytest
from pyspark.sql import functions as F

from parquetranger_spark import RepoCatalog, TableRepo


def _mk(spark, tmp_root, rows, grouped=True):
    t = TableRepo(
        tmp_root + "/t",
        group_cols="g" if grouped else None,
        commit_mode="manifest",
        spark=spark,
    )
    t.extend(
        spark.createDataFrame(rows, "k bigint, g string, v double")
    )
    return t


def _state(t):
    return {tuple(r) for r in t.get_full_df().select("k", "g", "v").collect()}


def test_replace_where_partial_partition(spark, tmp_root):
    t = _mk(
        spark,
        tmp_root,
        [(1, "a", 1.0), (2, "a", 5.0), (3, "b", 1.0)],
    )
    v0 = max(t.versions())
    t.replace_where(
        "g = 'a' AND v < 2", spark.createDataFrame([(9, "a", 1.5)], "k bigint, g string, v double")
    )
    # only the matching row replaced; the non-matching row in the SAME
    # partition and the other partition both survive
    assert _state(t) == {(9, "a", 1.5), (2, "a", 5.0), (3, "b", 1.0)}
    # atomic: exactly ONE new committed version
    assert max(t.versions()) == v0 + 1


def test_replace_where_prunes_emptied_partition(spark, tmp_root):
    t = _mk(spark, tmp_root, [(1, "a", 1.0), (2, "b", 2.0)])
    # every row of partition 'b' matches, nothing replaces it — the
    # partition must come out EMPTY, not stale
    t.replace_where(
        "g = 'b'",
        spark.createDataFrame([], "k bigint, g string, v double"),
    )
    assert _state(t) == {(1, "a", 1.0)}


def test_replace_where_null_predicate_rows_kept(spark, tmp_root):
    t = _mk(spark, tmp_root, [(1, "a", 1.0), (2, "a", None)])
    t.replace_where(
        "v < 2", spark.createDataFrame([(9, "a", 0.5)], "k bigint, g string, v double")
    )
    # NULL predicate = kept (SQL DELETE semantics)
    assert _state(t) == {(9, "a", 0.5), (2, "a", None)}


def test_replace_where_refuses_rows_outside_region(spark, tmp_root):
    t = _mk(spark, tmp_root, [(1, "a", 1.0)])
    with pytest.raises(ValueError, match="do not satisfy the predicate"):
        t.replace_where(
            "g = 'a'",
            spark.createDataFrame([(9, "b", 9.0)], "k bigint, g string, v double"),
        )
    # refused atomically: nothing changed
    assert _state(t) == {(1, "a", 1.0)}


def test_replace_where_ungrouped(spark, tmp_root):
    t = _mk(spark, tmp_root, [(1, "x", 1.0), (2, "y", 5.0)], grouped=False)
    t.replace_where(
        "v < 2", spark.createDataFrame([(9, "x", 0.1)], "k bigint, g string, v double")
    )
    assert _state(t) == {(9, "x", 0.1), (2, "y", 5.0)}


def test_sql_replace_where_and_describe_history(spark, tmp_root):
    cat = RepoCatalog(spark, base_dir=tmp_root)
    cat.sql("CREATE TABLE r1 (k BIGINT, g STRING, v DOUBLE) PARTITIONED BY (g)")
    cat.sql(
        "INSERT INTO r1 VALUES (1, 'a', 1.0D), (2, 'a', 5.0D), (3, 'b', 1.0D)"
    )
    cat.sql(
        "INSERT INTO r1 REPLACE WHERE g = 'a' AND v < 2 "
        "VALUES (9, 'a', 1.5D)"
    )
    assert {
        tuple(r) for r in cat.sql("SELECT k, g, v FROM r1").collect()
    } == {(9, "a", 1.5), (2, "a", 5.0), (3, "b", 1.0)}
    # a predicate containing parens/IN survives the extent scan
    cat.sql(
        "INSERT INTO r1 REPLACE WHERE g IN ('b') VALUES (7, 'b', 7.0D)"
    )
    assert (7, "b", 7.0) in {
        tuple(r) for r in cat.sql("SELECT k, g, v FROM r1").collect()
    }
    with pytest.raises(ValueError, match="REPLACE WHERE composes"):
        cat.sql("INSERT OVERWRITE r1 REPLACE WHERE g='a' VALUES (1,'a',1.0D)")
    hist = cat.sql("DESCRIBE HISTORY r1").collect()
    assert [r.version for r in hist] == sorted(r.version for r in hist)
    assert len(hist) == 3 and all(r.n_commits >= 0 for r in hist)