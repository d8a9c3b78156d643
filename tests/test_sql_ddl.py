"""SQL DDL front door (sources/sql_catalog.py, round 10): CREATE TABLE
(declaration + CTAS), ALTER TABLE ADD/RENAME/DROP/ALTER COLUMN routed to
the metadata-only schema-log DDL (S33), DROP/TRUNCATE TABLE, DESCRIBE,
SHOW TABLES — the last front-door asymmetry (round-9 verdict: "DDL heads
refused by design") closed. Every mutation here is metadata-only or a
committed native op; no statement rewrites data files except TRUNCATE's
predicate delete."""

import pytest
from pyspark.sql import types as T

from parquetranger_spark import RepoCatalog, TableRepo


@pytest.fixture()
def cat(spark, tmp_root):
    return RepoCatalog(spark, base_dir=tmp_root)


def _rows(cat, sql):
    return {tuple(r) for r in cat.sql(sql).collect()}


# ------------------------------------------------------------- CREATE


def test_create_declares_before_any_write(spark, cat):
    cat.sql(
        "CREATE TABLE t1 (k BIGINT, g STRING, v DOUBLE, PRIMARY KEY (k)) "
        "PARTITIONED BY (g)"
    )
    # readable as an EMPTY canonical frame before any row lands
    df = cat.sql("SELECT * FROM t1")
    assert df.columns == ["k", "g", "v"] and df.count() == 0
    # positional INSERT knows the declared order
    cat.sql("INSERT INTO t1 VALUES (1, 'a', 1.5D)")
    assert _rows(cat, "SELECT k, g, v FROM t1") == {(1, "a", 1.5)}
    # the declaration is durable: a fresh handle reopens with config
    reopened = TableRepo.open(cat.table("t1").main_path, spark=spark)
    assert reopened.group_cols == ["g"] and reopened.index_cols == ["k"]


def test_create_if_not_exists_and_collisions(spark, cat):
    cat.sql("CREATE TABLE t2 (a INT)")
    with pytest.raises(ValueError, match="already registered"):
        cat.sql("CREATE TABLE t2 (a INT)")
    cat.sql("CREATE TABLE IF NOT EXISTS t2 (a INT)")  # no-op, no raise
    with pytest.raises(ValueError, match="not in the declared schema"):
        cat.sql("CREATE TABLE t3 (a INT) PARTITIONED BY (nope)")
    with pytest.raises(ValueError, match="DEFAULT in CREATE TABLE"):
        cat.sql("CREATE TABLE t4 (a INT DEFAULT 3)")
    with pytest.raises(ValueError, match="base_dir or a LOCATION"):
        RepoCatalog(spark).sql("CREATE TABLE t5 (a INT)")


def test_ctas_partitioned(spark, cat, tmp_root):
    spark.range(6).selectExpr(
        "id AS k", "cast(id % 2 AS string) AS g", "cast(id AS double) AS v"
    ).createOrReplaceTempView("src6")
    cat.sql(
        "CREATE TABLE c1 PARTITIONED BY (g) "
        f"LOCATION '{tmp_root}/elsewhere/c1' AS SELECT * FROM src6"
    )
    assert cat.sql("SELECT count(*) AS n FROM c1").collect()[0].n == 6
    assert cat.table("c1").group_cols == ["g"]
    assert cat.table("c1").main_path.startswith(tmp_root + "/elsewhere")
    with pytest.raises(ValueError, match="not produced by the query"):
        cat.sql("CREATE TABLE c2 PARTITIONED BY (zz) AS SELECT * FROM src6")


# -------------------------------------------------------------- ALTER


def test_alter_add_column_with_initial_default(spark, cat):
    cat.sql("CREATE TABLE a1 (k BIGINT, v DOUBLE)")
    cat.sql("INSERT INTO a1 VALUES (1, 1.0D)")
    cat.sql("ALTER TABLE a1 ADD COLUMN tier STRING DEFAULT 'legacy'")
    # pre-DDL rows surface the initial default, not null
    assert _rows(cat, "SELECT k, tier FROM a1") == {(1, "legacy")}
    cat.sql("INSERT INTO a1 (k, v, tier) VALUES (2, 2.0D, 'new')")
    assert _rows(cat, "SELECT k, tier FROM a1") == {(1, "legacy"), (2, "new")}


def test_alter_rename_drop_widen(spark, cat):
    cat.sql("CREATE TABLE a2 (k BIGINT, v DOUBLE, junk INT, qty INT)")
    cat.sql("INSERT INTO a2 VALUES (1, 1.0D, 9, 7)")
    cat.sql("ALTER TABLE a2 RENAME COLUMN v TO amount")
    cat.sql("ALTER TABLE a2 DROP COLUMN junk")
    cat.sql("ALTER TABLE a2 ALTER COLUMN qty TYPE BIGINT")
    df = cat.sql("SELECT * FROM a2")
    assert df.columns == ["k", "amount", "qty"]
    assert dict(df.dtypes)["qty"] == "bigint"
    assert _rows(cat, "SELECT k, amount, qty FROM a2") == {(1, 1.0, 7)}
    with pytest.raises(ValueError, match="not a safe widening"):
        cat.sql("ALTER TABLE a2 ALTER COLUMN qty TYPE INT")
    with pytest.raises(ValueError, match="unsupported ALTER TABLE form"):
        cat.sql("ALTER TABLE a2 FROBNICATE")


def test_alter_nested_struct_field(spark, cat):
    cat.sql("CREATE TABLE n1 (k BIGINT, addr STRUCT<city: STRING>)")
    src = cat.table("n1")
    src.extend(
        src._spark.createDataFrame(
            [(1, ("Oslo",))],
            T.StructType(
                [
                    T.StructField("k", T.LongType()),
                    T.StructField(
                        "addr",
                        T.StructType([T.StructField("city", T.StringType())]),
                    ),
                ]
            ),
        )
    )
    cat.sql("ALTER TABLE n1 ADD COLUMN addr.zip STRING DEFAULT '0000'")
    assert _rows(cat, "SELECT k, addr.zip FROM n1") == {(1, "0000")}
    cat.sql("ALTER TABLE n1 RENAME COLUMN addr.zip TO postal")
    assert _rows(cat, "SELECT k, addr.postal FROM n1") == {(1, "0000")}
    with pytest.raises(ValueError, match="ONE struct level"):
        cat.sql("ALTER TABLE n1 DROP COLUMN addr.a.b")


# ------------------------------------------- DROP / TRUNCATE / inspect


def test_truncate_keeps_history_drop_removes(spark, cat):
    cat.sql("CREATE TABLE d1 (k BIGINT, v DOUBLE)")
    cat.sql("INSERT INTO d1 VALUES (1, 1.0D), (2, 2.0D)")
    cat.sql("TRUNCATE TABLE d1")
    assert cat.sql("SELECT count(*) AS n FROM d1").collect()[0].n == 0
    # the truncate was a committed delete: the pre-truncate version reads
    assert cat.table("d1").get_full_df(version=1).count() == 2
    root = cat.table("d1").main_path
    cat.sql("DROP TABLE d1")
    with pytest.raises(KeyError):
        cat.table("d1")
    import os

    assert not os.path.exists(root)
    cat.sql("DROP TABLE IF EXISTS d1")  # no-op, no raise
    with pytest.raises(KeyError):
        cat.sql("DROP TABLE d1")


def test_describe_and_show_tables(spark, cat):
    cat.sql(
        "CREATE TABLE m1 (k BIGINT, g STRING, v DOUBLE, PRIMARY KEY (k)) "
        "PARTITIONED BY (g)"
    )
    cat.register_view("vw", spark.range(1))
    desc = {r.col_name: (r.data_type, r.comment) for r in cat.sql("DESCRIBE m1").collect()}
    assert desc["k"] == ("bigint", "index key")
    assert desc["g"] == ("string", "partition key")
    assert desc["v"] == ("double", "")
    assert _rows(cat, "SHOW TABLES") == {("m1", "table"), ("vw", "view")}


def test_insert_overwrite_partition_static(spark, cat):
    cat.sql(
        "CREATE TABLE p1 (k BIGINT, g STRING, v DOUBLE) PARTITIONED BY (g)"
    )
    cat.sql(
        "INSERT INTO p1 VALUES (1, 'a', 1.0D), (2, 'a', 2.0D), (3, 'b', 3.0D)"
    )
    # static spec: only partition 'a' is overwritten, 'b' survives; the
    # select list does NOT carry g (Hive semantics)
    cat.sql("INSERT OVERWRITE p1 PARTITION (g = 'a') VALUES (9, 9.0D)")
    assert _rows(cat, "SELECT k, g, v FROM p1") == {
        (9, "a", 9.0),
        (3, "b", 3.0),
    }
    # INTO + static spec appends with the pinned value
    cat.sql("INSERT INTO p1 PARTITION (g = 'b') (k, v) VALUES (4, 4.0D)")
    assert (4, "b", 4.0) in _rows(cat, "SELECT k, g, v FROM p1")
    with pytest.raises(ValueError, match="non-partition column"):
        cat.sql("INSERT OVERWRITE p1 PARTITION (k = 1) VALUES ('a', 1.0D)")
    # with a static spec the select list must NOT carry g — positional
    # target is (k, v), so a 3-column query is an arity error
    with pytest.raises(ValueError, match="arity mismatch"):
        cat.sql(
            "INSERT OVERWRITE p1 PARTITION (g = 'a') "
            "SELECT k, g, v FROM p1"
        )
    with pytest.raises(ValueError, match="pick one"):
        cat.sql(
            "INSERT OVERWRITE p1 PARTITION (g = 'a') (k, g, v) "
            "VALUES (1, 'a', 1.0D)"
        )


def test_insert_overwrite_partition_dynamic(spark, cat):
    cat.sql(
        "CREATE TABLE p2 (k BIGINT, g STRING, v DOUBLE) PARTITIONED BY (g)"
    )
    cat.sql(
        "INSERT INTO p2 VALUES (1, 'a', 1.0D), (2, 'b', 2.0D), (3, 'c', 3.0D)"
    )
    # dynamic spec: only the partitions PRESENT in the query are
    # replaced ('a' untouched) — replace_groups, not replace_all
    cat.sql(
        "INSERT OVERWRITE p2 PARTITION (g) "
        "VALUES (8, 'b', 8.0D), (9, 'c', 9.0D)"
    )
    assert _rows(cat, "SELECT k, g, v FROM p2") == {
        (1, "a", 1.0),
        (8, "b", 8.0),
        (9, "c", 9.0),
    }
    # a dynamic spec means g comes FROM the query — omitting it from the
    # column list is the null-partition-key hazard, refused loudly
    with pytest.raises(ValueError, match="partition column"):
        cat.sql("INSERT OVERWRITE p2 PARTITION (g) (k, v) VALUES (1, 1.0D)")


def test_create_view_replans_per_read(spark, cat):
    cat.sql("CREATE TABLE v1 (k BIGINT, v DOUBLE)")
    cat.sql("INSERT INTO v1 VALUES (1, 1.0D)")
    cat.sql("CREATE VIEW big AS SELECT k FROM v1 WHERE v > 0.5")
    assert _rows(cat, "SELECT k FROM big") == {(1,)}
    # the view re-resolves the repo's LATEST snapshot, not the one it
    # was defined against
    cat.sql("INSERT INTO v1 VALUES (2, 2.0D), (3, 0.1D)")
    assert _rows(cat, "SELECT k FROM big") == {(1,), (2,)}
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE VIEW big AS SELECT 1")
    cat.sql("CREATE OR REPLACE VIEW big AS SELECT k FROM v1 WHERE v > 1.5")
    assert _rows(cat, "SELECT k FROM big") == {(2,)}
    # eager analysis: a body referencing nothing fails NOW
    with pytest.raises(Exception):
        cat.sql("CREATE VIEW broken AS SELECT zz FROM no_such_table")
    with pytest.raises(ValueError, match="time travel inside a view"):
        cat.sql("CREATE VIEW tt AS SELECT * FROM v1 VERSION AS OF 1")
    assert ("big", "view") in _rows(cat, "SHOW TABLES")
    cat.sql("DROP VIEW big")
    with pytest.raises(KeyError):
        cat.sql("DROP VIEW big")
    cat.sql("DROP VIEW IF EXISTS big")  # no-op


def test_optimize_vacuum_show_create(spark, cat):
    cat.sql(
        "CREATE TABLE o1 (k BIGINT, g STRING, v DOUBLE, PRIMARY KEY (k)) "
        "PARTITIONED BY (g)"
    )
    for i in range(3):
        cat.sql(
            f"INSERT INTO o1 VALUES ({i}, 'a', {i}.0D), ({i + 10}, 'b', 1.0D)"
        )
    t = cat.table("o1")
    nf_before = t.n_files
    cat.sql("OPTIMIZE o1 WHERE g = 'a'")
    assert {r.k for r in cat.sql("SELECT k FROM o1").collect()} == {
        0, 1, 2, 10, 11, 12,
    }
    cat.sql("OPTIMIZE o1")
    assert t.n_files <= nf_before
    with pytest.raises(ValueError, match="partition column"):
        cat.sql("OPTIMIZE o1 WHERE k = 1")
    swept = cat.sql("VACUUM o1 RETAIN 1 HOURS")
    assert swept.columns == ["path"]  # healthy table: nothing to sweep
    stmt = cat.sql("SHOW CREATE TABLE o1").collect()[0].createtab_stmt
    assert "PARTITIONED BY (g)" in stmt
    assert "PRIMARY KEY (k)" in stmt
    assert "LOCATION" in stmt


def test_sql_literal_defaults(spark, cat):
    cat.sql("CREATE TABLE l1 (k BIGINT)")
    cat.sql("INSERT INTO l1 VALUES (1)")
    cat.sql("ALTER TABLE l1 ADD COLUMN b BOOLEAN DEFAULT TRUE")
    cat.sql("ALTER TABLE l1 ADD COLUMN n BIGINT DEFAULT 42")
    cat.sql("ALTER TABLE l1 ADD COLUMN f DOUBLE DEFAULT 1.5")
    cat.sql("ALTER TABLE l1 ADD COLUMN s STRING DEFAULT 'it''s'")
    assert _rows(cat, "SELECT b, n, f, s FROM l1") == {(True, 42, 1.5, "it's")}
    with pytest.raises(ValueError, match="unsupported DEFAULT literal"):
        cat.sql("ALTER TABLE l1 ADD COLUMN z STRING DEFAULT now()")
