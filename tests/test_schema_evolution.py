"""Schema drift / dtype clash / widening — reference
tests/test_diff_cols.py (F7 in FIXTURES.md)."""

import pandas as pd

from parquetranger_spark import TableRepo


def test_new_columns_dropped_by_default(spark, tmp_root):
    # reference core.py:410: default keeps the first-seen schema
    t = TableRepo(f"{tmp_root}/t", group_cols="C", index_cols="__index")
    t.extend(spark.createDataFrame(pd.DataFrame({"__index": ["a"], "A": [1], "C": ["x"]})))
    t.extend(spark.createDataFrame(pd.DataFrame({"__index": ["b"], "B": [2], "C": ["x"]})))
    got = t.get_full_df().toPandas().sort_values("__index")
    assert sorted(got.columns) == ["A", "C", "__index"]
    assert got.A.tolist()[0] == 1 and pd.isna(got.A.tolist()[1])


def test_schema_extension_widens_and_rewrites(spark, tmp_root):
    # reference core.py:405-421 / tests/test_diff_cols.py:15-45
    t = TableRepo(
        f"{tmp_root}/t", group_cols="C", index_cols="__index", allow_schema_extension=True
    )
    t.extend(spark.createDataFrame(pd.DataFrame({"__index": ["a"], "A": [1], "C": ["x"]})))
    t.extend(spark.createDataFrame(pd.DataFrame({"__index": ["b"], "B": [2.5], "C": ["y"]})))
    got = t.get_full_df().toPandas().sort_values("__index").reset_index(drop=True)
    assert sorted(got.columns) == ["A", "B", "C", "__index"]
    assert got.B.tolist()[1] == 2.5 and pd.isna(got.B.tolist()[0])
    assert got.A.tolist()[0] == 1 and pd.isna(got.A.tolist()[1])


def test_dtype_clash_casts_to_first_seen(spark, tmp_root):
    # F7: double first, then long — long rows cast to double
    t = TableRepo(f"{tmp_root}/t", index_cols="__index")
    t.extend(spark.createDataFrame(pd.DataFrame({"__index": ["a"], "A": [1.5]})))
    t.extend(spark.createDataFrame(pd.DataFrame({"__index": ["b"], "A": [2]})))
    got = t.get_full_df().toPandas().sort_values("__index")
    assert got.A.dtype == "float64"
    assert got.A.tolist() == [1.5, 2.0]


def test_multi_index_keys(spark, tmp_root):
    # MultiIndex → multiple key columns (reference tests/test_diff_cols.py:11)
    pdf = pd.DataFrame(
        {"ix": ["a", "a", "b"], "iy": [1, 2, 1], "A": [10, 20, 30]}
    )
    t = TableRepo(f"{tmp_root}/t", index_cols=["ix", "iy"])
    t.extend(spark.createDataFrame(pdf))
    upd = pd.DataFrame({"ix": ["a", "c"], "iy": [2, 9], "A": [99, 77]})
    t.replace_records(spark.createDataFrame(upd))
    got = t.get_full_df().toPandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    assert got.A.tolist() == [10, 99, 30, 77]
