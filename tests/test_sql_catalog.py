"""SQL front door for TableRepo DML (sources/sql_catalog.py — round-8
verdict "What's missing #3"): INSERT / INSERT OVERWRITE / UPDATE /
DELETE / MERGE INTO in SQL text route to the engine's native committed
operations; reads re-resolve registered repos to their latest snapshot
so SQL between writes reads its own effects."""

import pytest
from pyspark.sql import functions as F

from parquetranger_spark import RepoCatalog, TableRepo


@pytest.fixture()
def cat(spark, tmp_root):
    c = RepoCatalog(spark)
    t = TableRepo(
        tmp_root + "/sales",
        group_cols="g",
        index_cols="k",
        commit_mode="manifest",
        spark=spark,
    )
    c.register("sales", t)
    return c


def _state(cat):
    return {
        (r.k, r.g, r.v)
        for r in cat.sql("SELECT k, g, v FROM sales").collect()
    }


def test_insert_values_and_select(spark, cat):
    cat.sql("INSERT INTO sales (k, g, v) VALUES (1, 'a', 1.0D), (2, 'b', 2.0D)")
    assert _state(cat) == {(1, "a", 1.0), (2, "b", 2.0)}
    # positional form against the now-known schema
    cat.sql("INSERT INTO sales VALUES (3, 'a', 3.0D)")
    assert (3, "a", 3.0) in _state(cat)


def test_insert_select_and_overwrite(spark, cat):
    spark.range(4).selectExpr(
        "cast(id as int) k", "cast(id % 2 as string) g", "cast(id as double) v"
    ).createOrReplaceTempView("src4")
    cat.sql("INSERT INTO sales SELECT k, g, v FROM src4")
    assert len(_state(cat)) == 4
    cat.sql("INSERT OVERWRITE sales SELECT k, g, v FROM src4 WHERE k < 2")
    assert _state(cat) == {(0, "0", 0.0), (1, "1", 1.0)}


def test_update_and_delete(spark, cat):
    cat.sql(
        "INSERT INTO sales (k, g, v) VALUES"
        " (1,'a',1.0D), (2,'a',2.0D), (3,'b',3.0D), (4,'b',4.0D)"
    )
    cat.sql("UPDATE sales SET v = v * 10 WHERE k % 2 = 0")
    assert _state(cat) == {
        (1, "a", 1.0), (2, "a", 20.0), (3, "b", 3.0), (4, "b", 40.0)
    }
    cat.sql("DELETE FROM sales WHERE v > 25")
    assert _state(cat) == {(1, "a", 1.0), (2, "a", 20.0), (3, "b", 3.0)}
    # UPDATE without WHERE touches every row
    cat.sql("UPDATE sales SET v = 0.5")
    assert {v for _k, _g, v in _state(cat)} == {0.5}


def test_merge_full_clause_set(spark, cat):
    cat.sql("INSERT INTO sales (k, g, v) VALUES (1,'a',1.0D), (2,'a',2.0D), (3,'b',3.0D)")
    cat.sql(
        """
MERGE INTO sales AS t
USING (SELECT * FROM VALUES (2, 'a', 100.0D), (3, 'b', 0.0D), (9, 'c', 9.0D)
       AS s(k, g, v)) AS s
ON t.k = s.k
WHEN MATCHED AND s.v = 0.0 THEN DELETE
WHEN MATCHED THEN UPDATE SET v = t.v + s.v
WHEN NOT MATCHED THEN INSERT *
"""
    )
    assert _state(cat) == {(1, "a", 1.0), (2, "a", 102.0), (9, "c", 9.0)}


def test_merge_set_star_and_view_source(spark, cat):
    cat.sql("INSERT INTO sales (k, g, v) VALUES (1,'a',1.0D), (2,'b',2.0D)")
    cat.register_view(
        "updates",
        spark.createDataFrame([(2, "b", 22.0)], "k int, g string, v double"),
    )
    cat.sql(
        "MERGE INTO sales t USING updates u ON t.k = u.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    assert _state(cat) == {(1, "a", 1.0), (2, "b", 22.0)}


def test_merge_on_must_be_key_equality(spark, cat):
    cat.sql("INSERT INTO sales (k, g, v) VALUES (1,'a',1.0D)")
    cat.register_view(
        "u2", spark.createDataFrame([(1, "a", 5.0)], "k int, g string, v double")
    )
    with pytest.raises(ValueError, match="index_cols"):
        cat.sql(
            "MERGE INTO sales t USING u2 u ON t.v = u.v "
            "WHEN MATCHED THEN UPDATE SET *"
        )
    with pytest.raises(ValueError, match="index_cols"):
        cat.sql(
            "MERGE INTO sales t USING u2 u ON t.k = u.k AND t.g = u.g "
            "WHEN MATCHED THEN UPDATE SET *"
        )


def test_reads_see_committed_writes_and_arbitrary_sql(spark, cat):
    cat.sql("INSERT INTO sales (k, g, v) VALUES (1,'a',1.0D), (2,'a',2.0D), (3,'b',3.0D)")
    got = cat.sql(
        "WITH t AS (SELECT g, sum(v) AS s FROM sales GROUP BY g) "
        "SELECT g, s FROM t ORDER BY g"
    ).collect()
    assert [(r.g, r.s) for r in got] == [("a", 3.0), ("b", 3.0)]
    # the view is re-resolved per statement, not captured at register time
    cat.sql("DELETE FROM sales WHERE g = 'b'")
    assert cat.sql("SELECT count(*) AS n FROM sales").collect()[0].n == 2


def test_unsupported_heads_fail_loudly(spark, cat):
    # DDL heads route natively since round 10 (tests/test_sql_ddl.py);
    # heads with no engine counterpart still refuse loudly
    with pytest.raises(ValueError, match="unsupported statement head"):
        cat.sql("GRANT SELECT ON sales TO analyst")
    with pytest.raises(ValueError, match="unsupported statement head"):
        cat.sql("ANALYZE TABLE sales COMPUTE STATISTICS")
    with pytest.raises(KeyError, match="unknown table"):
        cat.sql("DELETE FROM nosuch WHERE 1=1")
    with pytest.raises(ValueError, match="arity mismatch"):
        cat.sql("INSERT INTO sales (k, g) VALUES (1, 'a', 2.0D)")


def test_quoted_strings_survive_parsing(spark, cat, tmp_root):
    # a separate un-grouped repo: 's' is a plain column, assignable by
    # UPDATE (the sales fixture's 'g' is a partition group column, which
    # update_where rightly refuses)
    notes = TableRepo(
        tmp_root + "/notes", index_cols="k", commit_mode="manifest", spark=spark
    )
    cat.register("notes", notes)
    cat.sql("INSERT INTO notes (k, s) VALUES (1, 'a,b'), (2, 'w')")
    cat.sql("UPDATE notes SET s = 'x=y, z' WHERE s = 'a,b'")
    rows = {(r.k, r.s) for r in cat.sql("SELECT k, s FROM notes").collect()}
    assert rows == {(1, "x=y, z"), (2, "w")}
    cat.sql("DELETE FROM notes WHERE s = 'x=y, z'")
    assert cat.sql("SELECT count(*) n FROM notes").collect()[0].n == 1


def test_merge_crossed_aliases_refused(spark, cat):
    cat.sql("INSERT INTO sales (k, g, v) VALUES (1,'a',1.0D)")
    cat.register_view(
        "u3", spark.createDataFrame([(1, "a", 5.0)], "k int, g string, v double")
    )
    # aliasing the SOURCE as 'tgt' (or target as 'src') would swap the
    # engine's merge namespaces after normalization — refused
    with pytest.raises(ValueError, match="cross the engine namespaces"):
        cat.sql(
            "MERGE INTO sales AS src USING u3 AS tgt ON src.k = tgt.k "
            "WHEN MATCHED THEN UPDATE SET *"
        )


def test_time_travel_sql(spark, cat):
    import datetime
    import time

    cat.sql("INSERT INTO sales (k, g, v) VALUES (1,'a',1.0D)")
    time.sleep(1.1)
    ts = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None).isoformat()
    time.sleep(1.1)
    cat.sql("INSERT INTO sales VALUES (2, 'b', 2.0D)")
    cat.sql("UPDATE sales SET v = 99.0 WHERE k = 1")
    # current state
    assert cat.sql("SELECT count(*) AS n FROM sales").collect()[0].n == 2
    # VERSION AS OF: v1 = first insert only
    got = cat.sql("SELECT k, v FROM sales VERSION AS OF 1").collect()
    assert [(r.k, r.v) for r in got] == [(1, 1.0)]
    # TIMESTAMP AS OF between the two inserts resolves to v1
    got = cat.sql(f"SELECT count(*) AS n FROM sales TIMESTAMP AS OF '{ts}'")
    assert got.collect()[0].n == 1
    # travel composes with arbitrary SQL: join current vs v1
    diff = cat.sql(
        "SELECT cur.k, cur.v AS v_now, old.v AS v_then "
        "FROM sales cur LEFT JOIN sales VERSION AS OF 1 old ON cur.k = old.k "
        "ORDER BY cur.k"
    ).collect()
    assert [(r.k, r.v_now, r.v_then) for r in diff] == [
        (1, 99.0, 1.0), (2, 2.0, None)
    ]


# ----------------------------------------------------------- round 10
def test_time_travel_literal_survives_and_views_drop(spark, cat, tmp_root):
    """Round-9 verdict hardening: (a) a string literal containing
    'VERSION AS OF' is DATA, not travel syntax — the quote-aware rewrite
    must leave it verbatim; (b) the private __tt_* snapshot views drop
    after each read, so N travel reads leave the temp-view namespace
    exactly as they found it."""
    notes = TableRepo(
        tmp_root + "/notes_tt", index_cols="k", commit_mode="manifest", spark=spark
    )
    cat.register("notes_tt", notes)
    cat.sql("INSERT INTO notes_tt (k, s) VALUES (1, 'see VERSION AS OF 3'), (2, 'w')")
    got = {
        (r.k, r.s)
        for r in cat.sql(
            "SELECT k, s FROM notes_tt WHERE s = 'see VERSION AS OF 3'"
        ).collect()
    }
    assert got == {(1, "see VERSION AS OF 3")}

    def tt_views():
        return sorted(
            t.name for t in spark.catalog.listTables() if t.name.startswith("__tt_")
        )

    cat.sql("INSERT INTO notes_tt (k, s) VALUES (3, 'x')")
    before = tt_views()
    for _ in range(3):
        n = cat.sql("SELECT count(*) AS n FROM notes_tt VERSION AS OF 1").collect()[0].n
        assert n == 2
    assert tt_views() == before  # namespace stable across N travel reads


def test_merge_using_subquery_with_paren_in_literal(spark, cat):
    """Round-9 advice: the USING (subquery) extent scan must skip string
    literals — an unbalanced ')' inside a quote used to truncate the
    subquery at the wrong position and misparse the statement."""
    cat.sql("INSERT INTO sales (k, g, v) VALUES (1,'a',1.0D), (2,'b',2.0D)")
    cat.register_view(
        "u5",
        spark.createDataFrame(
            [(1, "a", 10.0, ")"), (2, "b", 20.0, "x")],
            "k int, g string, v double, tag string",
        ),
    )
    cat.sql(
        "MERGE INTO sales t USING "
        "(SELECT k, g, v FROM u5 WHERE tag != ')') u "
        "ON t.k = u.k WHEN MATCHED THEN UPDATE SET *"
    )
    assert _state(cat) == {(1, "a", 1.0), (2, "b", 20.0)}


def test_merge_on_same_side_equality_refused(spark, cat):
    """Round-9 advice: ``ON tgt.k = tgt.k`` passed the old check (both
    alternation branches allowed either alias) while the engine matched
    on src/tgt key equality — silently different semantics. Now one
    operand must be target-qualified and the other source-qualified."""
    cat.sql("INSERT INTO sales (k, g, v) VALUES (1,'a',1.0D)")
    cat.register_view(
        "u6", spark.createDataFrame([(1, "a", 5.0)], "k int, g string, v double")
    )
    for on in ("t.k = t.k", "u.k = u.k"):
        with pytest.raises(ValueError, match="cross-side"):
            cat.sql(
                f"MERGE INTO sales t USING u6 u ON {on} "
                "WHEN MATCHED THEN UPDATE SET *"
            )
    # the legitimate cross-side form still works, either operand order
    cat.sql(
        "MERGE INTO sales t USING u6 u ON u.k = t.k "
        "WHEN MATCHED THEN UPDATE SET v = u.v"
    )
    assert _state(cat) == {(1, "a", 5.0)}


def test_insert_partial_column_list(spark, cat):
    """Round-9 verdict #7: INSERT naming a SUBSET of columns lands typed
    nulls for the rest (extend's schema alignment); a typo'd column or an
    omitted non-generated partition column is refused loudly instead of
    silently dropping data."""
    cat.sql("INSERT INTO sales (k, g, v) VALUES (1,'a',1.0D)")
    cat.sql("INSERT INTO sales (k, g) VALUES (2, 'b')")  # v omitted -> null
    rows = {
        (r.k, r.g, r.v) for r in cat.sql("SELECT k, g, v FROM sales").collect()
    }
    assert rows == {(1, "a", 1.0), (2, "b", None)}
    with pytest.raises(ValueError, match="unknown column"):
        cat.sql("INSERT INTO sales (k, g, nosuch) VALUES (3, 'c', 9.0D)")
    with pytest.raises(ValueError, match="partition column"):
        cat.sql("INSERT INTO sales (k, v) VALUES (3, 9.0D)")  # omits g
    # nothing from the refused statements landed
    assert len(_state(cat)) == 2
