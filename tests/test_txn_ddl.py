"""Conflict-checked schema DDL vs multi-table transactions (round-7
verdict #4): an epoch flip cannot be gated on a txn marker (the schema log
has no read-side txn resolution by design), so DDL racing an OPEN
transaction that staged entries on the table must refuse LOUDLY — and
proceed normally once the transaction is decided, with the txn's entries
mapping by field id across the later epochs."""

import pytest
from pyspark.sql import functions as F

from parquetranger_spark.sources.table_repo import TableRepo
from parquetranger_spark.sources.txn import Transaction


def _repo(spark, root):
    return TableRepo(
        root, group_cols="g", index_cols="k", commit_mode="manifest", spark=spark
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, v double")


def test_ddl_refuses_while_txn_pending(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_df(spark, [(1, "A", 1.0)]))
    x = Transaction(f"{tmp_root}/_txns")
    x.extend(t, _df(spark, [(2, "B", 2.0)]))
    with pytest.raises(RuntimeError, match="undecided transaction"):
        t.rename_column("v", "value")
    with pytest.raises(RuntimeError, match="undecided transaction"):
        t.add_column("extra", "int")
    x.commit()
    # decided: DDL proceeds, and the txn's entry maps by id afterwards
    t.rename_column("v", "value")
    got = {(r.k, r.value) for r in t.get_full_df().collect()}
    assert got == {(1, 1.0), (2, 2.0)}


def test_nested_ddl_refuses_while_txn_pending(spark, tmp_root):
    t = TableRepo(
        f"{tmp_root}/t", group_cols="g", index_cols="k",
        commit_mode="manifest", spark=spark,
    )
    t.extend(
        spark.createDataFrame(
            [(1, "A", (1, "x"))], "k int, g string, meta struct<w:int, fmt:string>"
        )
    )
    x = Transaction(f"{tmp_root}/_txns")
    x.extend(
        t,
        spark.createDataFrame(
            [(2, "B", (2, "y"))], "k int, g string, meta struct<w:int, fmt:string>"
        ),
    )
    with pytest.raises(RuntimeError, match="undecided transaction"):
        t.rename_struct_field("meta", "w", "width")
    x.abort()
    t.rename_struct_field("meta", "w", "width")  # decided (aborted): fine
    assert {r.meta.width for r in t.get_full_df().collect()} == {1}


def test_txn_on_other_table_never_blocks(spark, tmp_root):
    a = _repo(spark, f"{tmp_root}/a")
    b = _repo(spark, f"{tmp_root}/b")
    a.extend(_df(spark, [(1, "A", 1.0)]))
    b.extend(_df(spark, [(1, "A", 1.0)]))
    x = Transaction(f"{tmp_root}/_txns")
    x.extend(b, _df(spark, [(2, "B", 2.0)]))
    a.rename_column("v", "value")  # a has no gated entries — unaffected
    assert "value" in a.get_full_df().columns
    x.commit()


def test_ddl_then_txn_write_maps_by_id(spark, tmp_root):
    """The sanctioned ordering: decide DDL first, then open the txn. A txn
    write after a rename aligns to (and stamps) the new epoch; committing
    flips it in atomically with correct mapping."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_df(spark, [(1, "A", 1.0)]))
    t.rename_column("v", "value")
    x = Transaction(f"{tmp_root}/_txns")
    x.extend(
        t, spark.createDataFrame([(3, "C", 3.0)], "k int, g string, value double")
    )
    assert {r.k for r in t.get_full_df().collect()} == {1}  # gated
    x.commit()
    assert {(r.k, r.value) for r in t.get_full_df().collect()} == {
        (1, 1.0),
        (3, 3.0),
    }
