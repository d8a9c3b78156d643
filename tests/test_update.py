"""SQL UPDATE over TableRepo: copy-on-write (``update_where``) and
merge-on-read (``update_where_dv`` — dv tombstones + gated append under
one single-table transaction marker). No reference counterpart
(parquetranger core.py can only overwrite whole tables/groups)."""

import pandas as pd
import pytest

from parquetranger_spark.sources.table_repo import TableRepo


def _frame():
    return pd.DataFrame(
        {
            "k": [f"k{i}" for i in range(8)],
            "grp": [str(i % 2) for i in range(8)],
            "val": [float(i) for i in range(8)],
            "note": [None if i == 3 else f"n{i}" for i in range(8)],
        }
    )


def _repo(spark, root, **kw):
    kw.setdefault("group_cols", "grp")
    kw.setdefault("index_cols", ["k"])
    kw.setdefault("commit_mode", "manifest")
    return TableRepo(root, spark=spark, **kw)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# --------------------------------------------------------------- copy-on-write


def test_update_where_basic_and_null_condition(spark, tmp_root):
    """TRUE rows get the assignment (evaluated on OLD values); FALSE and
    NULL-evaluating rows are kept unchanged (unknown-is-false)."""
    t = _repo(spark, f"{tmp_root}/cow")
    t.extend(spark.createDataFrame(_frame()))
    # note IS NULL for k3 → "note = 'n3'" is NULL there → not updated
    t.update_where({"val": "val * 10"}, "note >= 'n5' OR note IS NULL AND FALSE")
    got = {r["k"]: r["val"] for r in t.get_full_df().collect()}
    assert got == {
        "k0": 0.0, "k1": 1.0, "k2": 2.0, "k3": 3.0, "k4": 4.0,
        "k5": 50.0, "k6": 60.0, "k7": 70.0,
    }
    assert t.get_full_df().count() == 8


def test_update_where_prunes_untouched_partitions(spark, tmp_root):
    """Only partitions holding matched rows are rewritten — the rest of
    the table's files are byte-identical (O(touched partitions))."""
    t = _repo(spark, f"{tmp_root}/prune")
    t.extend(spark.createDataFrame(_frame()))
    before = {p for p in t.paths if "grp=1" in p}
    t.update_where({"val": "val + 100"}, "grp = '0' AND k = 'k0'")
    assert {p for p in t.paths if "grp=1" in p} == before
    assert t.get_full_df().where("k = 'k0'").collect()[0]["val"] == 100.0


def test_update_where_guards(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/guards")
    t.extend(spark.createDataFrame(_frame()))
    with pytest.raises(ValueError, match="partition group"):
        t.update_where({"grp": "'9'"}, "k = 'k0'")
    with pytest.raises(ValueError, match="unknown columns"):
        t.update_where({"nope": "1"}, "k = 'k0'")
    # no matches → no new version published
    v = t.versions()
    t.update_where({"val": "0"}, "k = 'missing'")
    assert t.versions() == v


def test_update_where_casts_to_column_type(spark, tmp_root):
    """Assignments are cast to the column's existing type — UPDATE never
    mutates the schema."""
    t = _repo(spark, f"{tmp_root}/cast")
    t.extend(spark.createDataFrame(_frame()))
    t.update_where({"val": "7"}, "k = 'k1'")  # int literal into double col
    df = t.get_full_df()
    assert dict(df.dtypes)["val"] == "double"
    assert df.where("k = 'k1'").collect()[0]["val"] == 7.0


def test_update_where_ungrouped_table(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/flat", group_cols=None)
    t.extend(spark.createDataFrame(_frame().drop(columns=["grp"])))
    t.update_where({"val": "val - 1"}, "k IN ('k0', 'k7')")
    got = {r["k"]: r["val"] for r in t.get_full_df().collect()}
    assert got["k0"] == -1.0 and got["k7"] == 6.0 and got["k4"] == 4.0


# --------------------------------------------------------------- merge-on-read


def test_update_where_dv_rewrites_no_data_files(spark, tmp_root):
    """MoR update: every pre-existing data file survives untouched; the
    change is one dv entry + one append, atomically visible."""
    t = _repo(spark, f"{tmp_root}/mor")
    t.extend(spark.createDataFrame(_frame()))
    before = set(t.paths)
    t.update_where_dv({"val": "val * 2", "note": "'upd'"}, "val >= 6")
    assert before <= set(t.paths)  # old files all still on disk
    got = {r["k"]: (r["val"], r["note"]) for r in t.get_full_df().collect()}
    assert got["k6"] == (12.0, "upd") and got["k7"] == (14.0, "upd")
    assert got["k5"] == (5.0, "n5")
    assert t.get_full_df().count() == 8
    # count fast path agrees with the dv-effective row set
    assert t.count_rows() == 8


def test_update_where_dv_key_rewrite(spark, tmp_root):
    """Assigning a key column tombstones the OLD key and appends the new
    image under the NEW key."""
    t = _repo(spark, f"{tmp_root}/keymv")
    t.extend(spark.createDataFrame(_frame()))
    t.update_where_dv({"k": "concat(k, '_x')"}, "k = 'k2'")
    ks = {r["k"] for r in t.get_full_df().select("k").collect()}
    assert "k2" not in ks and "k2_x" in ks
    assert t.get_full_df().count() == 8


def test_update_where_dv_time_travel_sees_old(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/tt")
    t.extend(spark.createDataFrame(_frame()))
    v0 = t.versions()[-1]
    t.update_where_dv({"val": "0"}, "val > 0")
    assert t.get_full_df().where("val > 0").count() == 0
    old = t.get_full_df(version=v0)
    assert old.where("val > 0").count() == 7


def test_update_where_dv_conflict_aborts(spark, tmp_root):
    """A commit landing between the update's snapshot and its marker CAS
    aborts the txn: the update's entries never become visible."""
    from parquetranger_spark.sources.table_repo import ConcurrentWriteError

    t = _repo(spark, f"{tmp_root}/conflict")
    t.extend(spark.createDataFrame(_frame()))
    orig_baseline = t._rmw_baseline

    def racing_baseline():
        rmw = orig_baseline()
        # concurrent writer lands a dv delete AFTER our snapshot
        t2 = _repo(spark, f"{tmp_root}/conflict")
        t2.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["k0"]})))
        return rmw

    t._rmw_baseline = racing_baseline
    with pytest.raises(ConcurrentWriteError):
        t.update_where_dv({"val": "99"}, "k = 'k0'")
    t._rmw_baseline = orig_baseline
    # the aborted update left no trace: k0 is deleted (the racer won),
    # nothing was updated to 99
    df = t.get_full_df()
    assert df.where("val = 99").count() == 0
    assert df.where("k = 'k0'").count() == 0


def test_update_where_dv_guards(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/dvguards", index_cols=None)
    t.extend(spark.createDataFrame(_frame()))
    with pytest.raises(TypeError, match="index_cols"):
        t.update_where_dv({"val": "0"}, "k = 'k0'")
    t2 = _repo(spark, f"{tmp_root}/dvguards2", commit_mode="files")
    with pytest.raises(TypeError, match="manifest"):
        t2.update_where_dv({"val": "0"}, "k = 'k0'")
