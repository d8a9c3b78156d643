"""GENERATED columns (the Delta GENERATED ALWAYS AS shape): absent on
write → computed from the expression; present → validated null-safely
with whole-batch reject on mismatch. The main customer is a derived
partition column (day = date(ts)) whose pruning invariant must be
unbreakable by writers."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from parquetranger_spark.sources.table_repo import TableRepo


def _repo(spark, root, **kw):
    return TableRepo(
        root,
        group_cols="day",
        index_cols="k",
        commit_mode="manifest",
        generated_cols={"day": "to_date(ts)"},
        spark=spark,
        **kw,
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, ts timestamp, v double")


TS1 = dt.datetime(2026, 1, 2, 10, 0)
TS2 = dt.datetime(2026, 1, 3, 11, 0)


def test_generated_partition_col_computed_and_pruned(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_df(spark, [(1, TS1, 1.0), (2, TS2, 2.0)]))
    got = {(r.k, r.day) for r in t.get_full_df().collect()}
    assert got == {(1, dt.date(2026, 1, 2)), (2, dt.date(2026, 1, 3))}
    # the derived column partitions (and prunes) like any declared one
    assert sorted(t.partition_values()) == [dt.date(2026, 1, 2), dt.date(2026, 1, 3)]
    assert t.get_partition_df(dt.date(2026, 1, 2)).count() == 1
    # every write path generates: keyed upsert through _prepare too
    t.replace_records(_df(spark, [(1, TS1, 9.0)]))
    assert t.get_full_df().where("k = 1").collect()[0].v == 9.0


def test_provided_value_validates_or_rejects_batch(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    ok = spark.createDataFrame(
        [(1, TS1, 1.0, dt.date(2026, 1, 2))], "k int, ts timestamp, v double, day date"
    )
    t.extend(ok)  # consistent value passes
    bad = spark.createDataFrame(
        [(2, TS2, 2.0, dt.date(1999, 9, 9))], "k int, ts timestamp, v double, day date"
    )
    with pytest.raises(ValueError, match="generated column"):
        t.extend(bad)
    assert t.count_rows() == 1  # the bad batch landed nothing


def test_generation_persists_through_open_and_pins_ddl(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_df(spark, [(1, TS1, 1.0)]))
    o = TableRepo.open(t.main_path, spark=spark)
    assert o.generated_cols == {"day": "to_date(ts)"}
    o.extend(_df(spark, [(2, TS2, 2.0)]))  # reopened handle still generates
    assert o.count_rows() == 2
    # dropping/renaming a generated column is refused (here the
    # partition-column pin fires first — also structural)
    with pytest.raises(ValueError, match="partition column"):
        o.drop_column("day")
    # (day is also a partition col here, so clearing alone would still
    # refuse — use a non-partition generated col for the clear path)
    t2 = TableRepo(
        f"{tmp_root}/t2",
        index_cols="k",
        commit_mode="manifest",
        generated_cols={"vsq": "v * v"},
        spark=spark,
    )
    t2.extend(_df(spark, [(1, TS1, 3.0)]))
    assert t2.get_full_df().collect()[0].vsq == 9.0
    with pytest.raises(ValueError, match="GENERATED"):
        t2.rename_column("vsq", "v2")
    t2.set_table_properties(generated_cols=None)
    t2.rename_column("vsq", "v2")  # cleared → DDL proceeds
    assert "v2" in t2.get_full_df().columns
