"""Round-trip / layout / upsert tests mirroring the reference suite
(/root/reference/parquetranger/tests/test_core.py — fixtures F1/F2 in
/root/repo/FIXTURES.md). Oracle is pandas on the same rows."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parquetranger_spark import HashPartitioner, TableRepo
from parquetranger_spark.queries.common import load

# F1 `base4` — reference tests/test_core.py:11-48
DF1 = pd.DataFrame(
    {
        "__index": ["a1", "a2", "a3"],
        "A": [1, 2, 3],
        "B": ["x", "y", "z"],
        "C": [1, 2, 1],
        "C2": ["a", "b", "a"],
    }
)
DF2 = pd.DataFrame(
    {
        "__index": ["b1", "b2", "b3"],
        "A": [4, 5, 6],
        "B": ["xx", "yy", "zz"],
        "C": [2, 3, 3],
        "C2": ["b", "ba", "a"],
    }
)
DF4 = pd.DataFrame(
    {
        "__index": ["b4", "b2", "b3"],
        "A": [7, 8, 9],
        "B": ["p", "q", "r"],
        "C": [1, 1, 2],
        "C2": ["a", "a", "b"],
    }
)


def sorted_pdf(df):
    pdf = df.toPandas() if not isinstance(df, pd.DataFrame) else df
    return pdf.sort_values("__index").reset_index(drop=True)[sorted(pdf.columns)]


def assert_same(spark_df, pdf):
    got, want = sorted_pdf(spark_df), sorted_pdf(pdf)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("group_cols", [None, "C", ["C", "C2"], ["C2", "C"], "C2"])
@pytest.mark.parametrize("max_records", [0, 2])
def test_extend_roundtrip(spark, tmp_root, group_cols, max_records):
    trepo = TableRepo(
        f"{tmp_root}/t1",
        group_cols=group_cols,
        max_records=max_records,
        index_cols="__index",
    )
    trepo.extend(spark.createDataFrame(DF1))
    trepo.extend(spark.createDataFrame(DF2))
    assert_same(trepo.get_full_df(), pd.concat([DF1, DF2]))


def test_partition_layout(spark, tmp_root):
    trepo = TableRepo(f"{tmp_root}/t", group_cols="C", index_cols="__index")
    trepo.extend(spark.createDataFrame(DF1))
    # hive-style per-value dirs (reference asserts bare-value dirs,
    # tests/test_core.py:70 — layout differs, value sets must not)
    assert {"C=1", "C=2"} <= set(os.listdir(trepo.main_path))
    assert_same(trepo.get_partition_df(1), DF1[DF1.C == 1])
    assert_same(trepo.get_partition_df(2, partition_col="C"), DF1[DF1.C == 2])


def test_max_records_chunking(spark, tmp_root):
    trepo = TableRepo(f"{tmp_root}/t", max_records=1, index_cols="__index")
    trepo.extend(spark.createDataFrame(DF1).coalesce(1))
    assert trepo.n_files >= 3  # one row per file
    assert_same(trepo.get_full_df(), DF1)


def test_replace_all(spark, tmp_root):
    trepo = TableRepo(f"{tmp_root}/t", group_cols="C", index_cols="__index")
    trepo.extend(spark.createDataFrame(DF1))
    trepo.replace_all(spark.createDataFrame(DF2))
    assert_same(trepo.get_full_df(), DF2)


def test_replace_groups(spark, tmp_root):
    trepo = TableRepo(f"{tmp_root}/t", group_cols="C", index_cols="__index")
    trepo.extend(spark.createDataFrame(DF1))  # C ∈ {1, 2}
    repl = pd.DataFrame(
        {"__index": ["n1"], "A": [99], "B": ["n"], "C": [1], "C2": ["a"]}
    )
    trepo.replace_groups(spark.createDataFrame(repl))
    want = pd.concat([DF1[DF1.C != 1], repl])
    assert_same(trepo.get_full_df(), want)


def test_replace_records_ungrouped(spark, tmp_root):
    # reference tests/test_core.py:127-146: update by key, dup incoming
    # keys keep first, unmatched keys appended
    trepo = TableRepo(f"{tmp_root}/t", index_cols="__index")
    trepo.extend(spark.createDataFrame(DF2))
    trepo.replace_records(spark.createDataFrame(DF4))
    want = pd.concat([DF2[~DF2.__index.isin(DF4.__index)], DF4])
    assert_same(trepo.get_full_df(), want)


def test_replace_records_keeps_first_dup(spark, tmp_root):
    trepo = TableRepo(f"{tmp_root}/t", index_cols="__index")
    trepo.extend(spark.createDataFrame(DF1))
    dup = pd.DataFrame(
        {
            "__index": ["a1", "a1"],
            "A": [100, 200],
            "B": ["first", "second"],
            "C": [1, 1],
            "C2": ["a", "a"],
        }
    )
    trepo.replace_records(spark.createDataFrame(dup).coalesce(1))
    got = trepo.get_full_df().where(F.col("__index") == "a1").toPandas()
    assert got.B.tolist() == ["first"] and got.A.tolist() == [100]


def test_replace_records_grouped(spark, tmp_root):
    trepo = TableRepo(f"{tmp_root}/t", group_cols="C", index_cols="__index")
    trepo.extend(spark.createDataFrame(DF2))
    trepo.replace_records(spark.createDataFrame(DF4))
    want = pd.concat([DF2[~DF2.__index.isin(DF4.__index)], DF4])
    assert_same(trepo.get_full_df(), want)


def test_replace_records_by_groups(spark, tmp_root):
    # reference tests/test_core.py:149-179 / F2: same key may live in
    # different groups when matching is group-scoped
    base = pd.DataFrame(
        {"__index": ["x1", "x2"], "A": [1, 2], "B": ["g1", "g1"]}
    )
    trepo = TableRepo(f"{tmp_root}/t", group_cols="B", index_cols="__index")
    trepo.extend(spark.createDataFrame(base))
    upd = pd.DataFrame({"__index": ["x1", "y2"], "A": [10, 20], "B": ["g2", "g1"]})
    trepo.replace_records(spark.createDataFrame(upd), by_groups=True)
    got = sorted_pdf(trepo.get_full_df())
    # x1@g1 untouched (different group), x1@g2 + y2@g1 added
    assert len(got) == 4
    assert set(map(tuple, got[["__index", "B"]].values)) == {
        ("x1", "g1"),
        ("x2", "g1"),
        ("x1", "g2"),
        ("y2", "g1"),
    }


def test_purge_and_empty_read(spark, tmp_root):
    trepo = TableRepo(f"{tmp_root}/t", group_cols="C", index_cols="__index")
    trepo.extend(spark.createDataFrame(DF1))
    trepo.purge()
    assert trepo.n_files == 0
    assert trepo.get_full_df().count() == 0


def test_batch_extend(spark, tmp_root):
    trepo = TableRepo(f"{tmp_root}/t", group_cols="C", index_cols="__index")
    trepo.batch_extend([spark.createDataFrame(DF1), spark.createDataFrame(DF2)])
    assert_same(trepo.get_full_df(), pd.concat([DF1, DF2]))


def test_env_switching(spark, tmp_root):
    # reference tests/test_envs.py:6-47
    os.makedirs(f"{tmp_root}/prod"), os.makedirs(f"{tmp_root}/dev")
    trepo = TableRepo(
        f"{tmp_root}/prod/t",
        index_cols="__index",
        env_parents={"prod": f"{tmp_root}/prod", "dev": f"{tmp_root}/dev"},
    )
    trepo.extend(spark.createDataFrame(DF1))
    with trepo.env_ctx("dev"):
        trepo.extend(spark.createDataFrame(DF2))
        assert_same(trepo.get_full_df(), DF2)
    assert_same(trepo.get_full_df(), DF1)
    trepo.set_env("dev")
    assert_same(trepo.get_full_df(), DF2)
    trepo.set_env_to_default()
    assert_same(trepo.get_full_df(), DF1)


def test_null_group_keys_dropped(spark, tmp_root):
    # pandas groupby drops null keys (reference core.py:350, F5)
    pdf = pd.DataFrame(
        {
            "__index": ["a", "b", "c"],
            "A": [1.0, 2.0, 3.0],
            "C": ["g1", None, "g2"],
        }
    )
    trepo = TableRepo(f"{tmp_root}/t", group_cols="C", index_cols="__index")
    trepo.extend(spark.createDataFrame(pdf))
    got = sorted_pdf(trepo.get_full_df())
    assert got.__index.tolist() == ["a", "c"]


def test_metadata_roundtrip(tmp_root, spark):
    # reference tests/test_metadata.py:6-20 — sidecar JSON, not footer pickle
    trepo = TableRepo(
        f"{tmp_root}/t", index_cols="__index", extra_metadata={"source": "unit", "v": 2}
    )
    trepo.extend(spark.createDataFrame(DF1))
    again = TableRepo(f"{tmp_root}/t", index_cols="__index")
    assert again.full_metadata == {"source": "unit", "v": 2}


def test_hash_partitioning_buckets(spark, tmp_root):
    # F6 / reference tests/test_core.py:270-280: md5-mod-n, value-exact
    pdf = pd.DataFrame(
        {"__index": [str(i) for i in range(9)], "C": list("efg") * 3, "A": range(9)}
    )
    trepo = TableRepo(
        f"{tmp_root}/t",
        group_cols=HashPartitioner("C", 3),
        index_cols="__index",
    )
    trepo.extend(spark.createDataFrame(pdf))
    import hashlib

    def pybucket(v, n):
        return int(hashlib.md5(str(v).encode()).hexdigest(), 16) % n

    buckets = {v: pybucket(v, 3) for v in "efg"}
    bc = trepo.group_cols[0]
    got = {
        r["C"]: int(r[bc])
        for r in trepo.get_full_df().select("C", bc).distinct().collect()
    }
    assert got == buckets
    # the reference pins: 6 rows in bucket "2" of 3 (tests/test_core.py:274)
    n2 = trepo.get_full_df().where(F.col(bc) == "2").count()
    assert n2 == sum(6 for v in ["e"] if buckets[v] == 2) + sum(
        3 for v in "fg" if buckets[v] == 2
    )


def test_dfs_and_partition_paths(spark, tmp_root):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 4], "c": ["x", "x", "y", "y"], "v": [1.0, 2.0, 3.0, 4.0]})
    )
    t = TableRepo(f"{tmp_root}/t", group_cols="c")
    t.extend(df)
    # reference-shaped: takes the partition COLUMN, yields (value, paths)
    # groups for all values (reference core.py:177-183)
    groups = dict(t.get_partition_paths("c"))
    assert set(groups) == {"x", "y"}
    assert all("c=x" in p for p in groups["x"])
    assert set(groups["x"]) | set(groups["y"]) == set(t.paths)
    import pytest

    with pytest.raises(TypeError):
        t.get_partition_paths("not_a_partition_col")
    # single-value inverse lookup
    pp = t.paths_for_partition("x")
    assert pp == groups["x"]
    with pytest.raises(KeyError):
        t.paths_for_partition("zzz")
    # per-file frames carry the partition column back (reference core.py:216-223)
    total = 0
    for fdf in t.dfs:
        assert "c" in fdf.columns
        total += fdf.count()
    assert total == 4


def test_map_partitions_list_results(spark, tmp_root):
    # reference mode: fun returns an arbitrary (non-relational) value per
    # partition group and map_partitions returns the list of results —
    # scalar `len` payload mirrors reference tests/test_parallel.py:74-83
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"A": [1, 2, 1, 1], "B": ["x", "x", "y", "x"], "v": [1.0, 2.0, 3.0, 4.0]}
        )
    )
    t = TableRepo(f"{tmp_root}/t", group_cols=["A", "B"])
    t.extend(df)
    assert sorted(t.map_partitions(len)) == [1, 1, 2]
    for g, expected in (("A", [1, 3]), ("B", [1, 3])):
        assert sorted(t.map_partitions(fun=len, level=g)) == expected
    # arbitrary payloads survive the pickle round-trip
    shapes = t.map_partitions(lambda pdf: {"rows": len(pdf), "cols": sorted(pdf.columns)})
    assert sorted(s["rows"] for s in shapes) == [1, 1, 2]
    assert all(s["cols"] == ["A", "B", "v"] for s in shapes)


def test_arrow_table_variants(spark, tmp_root):
    """Arrow-returning readers mirror the reference's pyarrow surface
    (reference core.py:172-175,185-189,203-214,275-277)."""
    trepo = TableRepo(f"{tmp_root}/arrow", group_cols="C2", index_cols="__index", spark=spark)
    trepo.extend(spark.createDataFrame(DF1))
    full = trepo.get_full_table()
    assert full.num_rows == 3 and set(full.column_names) == set(DF1.columns)
    part = trepo.get_partition_table("a")
    assert part.num_rows == 2
    per_file = list(trepo.tables)
    assert sum(t.num_rows for t in per_file) == 3
    one = trepo.read_table_from_path(trepo.paths[0])
    assert "C2" in one.column_names  # partition col restored from dir name
    assert trepo.vc_path == trepo.main_path


def test_writer_reference_aliases(spark, tmp_root):
    """add_to_batch/close and the count attributes (reference core.py:458-523)."""
    trepo = TableRepo(f"{tmp_root}/walias", index_cols="__index", spark=spark)
    w = trepo.get_extending_dict_batch_writer(max_records=2)
    for rec in DF1.to_dict("records"):
        w.add_to_batch(rec)
    w.close()
    assert w.written_count == 3 and w.record_count == 0
    dw = trepo.get_extending_df_batch_writer()
    dw.add_to_batch(spark.createDataFrame(DF2))
    dw.close()
    assert dw.written_count == 3
    assert trepo.get_full_df().count() == 6


def test_typed_roundtrip_datetime_bytes_nulls(spark, tmp_root):
    """Type edges the reference exercises: datetime64 columns
    (tests/test_core.py:254-259, test_metadata.py:8), 20-byte blobs
    (tests/test_core.py:289-293), missing values (tests/test_core.py:261-267)."""
    import numpy as np

    pdf = pd.DataFrame(
        {
            "__index": ["r1", "r2", "r3", "r4"],
            "ts": pd.date_range("2021-01-01", periods=4, freq="1h"),
            "blob": [os.urandom(20) for _ in range(4)],
            "x": pd.array([1.5, None, 3.0, None], dtype="float64"),
            "n": pd.array([1, 2, None, 4], dtype="Int64"),
        }
    )
    trepo = TableRepo(f"{tmp_root}/typed", index_cols="__index", spark=spark)
    trepo.extend(spark.createDataFrame(pdf))
    back = trepo.get_full_df().toPandas().sort_values("__index").reset_index(drop=True)
    assert back["ts"].tolist() == pdf["ts"].tolist()
    assert [bytes(b) for b in back["blob"]] == pdf["blob"].tolist()
    assert back["x"].isna().tolist() == [False, True, False, True]
    assert back["n"].isna().tolist() == [False, False, True, False]
    # upsert through the same typed schema
    upd = pdf.iloc[[0]].assign(x=9.25)
    trepo.replace_records(spark.createDataFrame(upd))
    got = trepo.get_full_df().where(F.col("__index") == "r1").toPandas()
    assert got["x"].iloc[0] == 9.25 and got["ts"].iloc[0] == pdf["ts"].iloc[0]


def test_append_smoke_many_batches(spark, tmp_root):
    """Scaled-down twin of the reference's 400k-row append smoke
    (tests/test_core.py:283-300): repeated appends of (float, int, bytes)
    batches, then full-scan equality on count and sums."""
    import random

    rng = random.Random(7)
    trepo = TableRepo(f"{tmp_root}/smoke", index_cols="i", spark=spark)
    total, s = 0, 0.0
    for b in range(8):
        n = 500
        pdf = pd.DataFrame(
            {
                "i": range(total, total + n),
                "f": [rng.random() for _ in range(n)],
                "z": [rng.randbytes(20) for _ in range(n)],
            }
        )
        trepo.extend(spark.createDataFrame(pdf))
        total += n
        s += pdf["f"].sum()
    agg = trepo.get_full_df().agg(
        F.count(F.lit(1)).alias("n"), F.sum("f").alias("s")
    ).collect()[0]
    assert agg["n"] == total
    assert abs(agg["s"] - s) < 1e-6


def test_compact_coalesces_partition_files(spark, tmp_root):
    """compact() must shrink a fragmented partition to ~one file, leave
    unselected partitions byte-untouched, and preserve the row set."""
    t = TableRepo(f"{tmp_root}/t", group_cols="C2", index_cols="__index")
    # fragment: many small appends -> many files per partition
    for k in range(6):
        pdf = DF1.copy()
        pdf["__index"] = [f"{i}_{k}" for i in pdf["__index"]]
        t.extend(spark.createDataFrame(pdf))
    frag_a = [p for p in t.paths if "C2=a" in p]
    frag_b = set(p for p in t.paths if "C2=b" in p)
    assert len(frag_a) >= 6
    before = t.get_full_df().toPandas().sort_values("__index").reset_index(drop=True)

    t.compact(partition_values=["a"])

    after_a = [p for p in t.paths if "C2=a" in p]
    assert len(after_a) < len(frag_a)
    assert set(p for p in t.paths if "C2=b" in p) == frag_b  # untouched
    after = t.get_full_df().toPandas().sort_values("__index").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_compact_whole_table(spark, tmp_root):
    t = TableRepo(f"{tmp_root}/t", group_cols="C2", index_cols="__index")
    for k in range(4):
        pdf = DF2.copy()
        pdf["__index"] = [f"{i}_{k}" for i in pdf["__index"]]
        t.extend(spark.createDataFrame(pdf))
    n_before = t.n_files
    rows_before = t.get_full_df().count()
    t.compact()
    assert t.n_files < n_before
    assert t.get_full_df().count() == rows_before


def test_cluster_by_tightens_rowgroup_stats(spark, tmp_root, sf_dir):
    """cluster_by sorts each write task's rows on the cluster keys, so
    parquet row-group min/max spans shrink — the stats a filtered scan
    uses to skip row groups entirely."""
    import pyarrow.parquet as pq

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    def span_sum(t):
        total = 0
        for p in t.paths:
            f = pq.ParquetFile(p)
            for rg in range(f.metadata.num_row_groups):
                col = f.metadata.row_group(rg).column(0)  # l_orderkey
                st = col.statistics
                total += st.max - st.min
        return total

    plain = TableRepo(f"{tmp_root}/plain", max_records=300)
    plain.extend(li.select("l_orderkey", "l_quantity").repartition(4))
    clustered = TableRepo(f"{tmp_root}/clu", max_records=300, cluster_by="l_orderkey")
    clustered.extend(li.select("l_orderkey", "l_quantity").repartition(4))

    assert span_sum(clustered) < span_sum(plain) / 2
    assert clustered.get_full_df().count() == plain.get_full_df().count()


def test_categorical_group_key_roundtrip(spark, tmp_root):
    """Reference parity (tests/test_core.py:206-210 + core.py:359-360):
    pandas Categorical partition keys round-trip as strings, and empty
    categories produce no partition directories. Spark has no categorical
    dtype — the dictionary-encoded parquet column surfaces as StringType
    (SURVEY §1.3), and partitionBy only materializes observed values."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = f"{tmp_root}/cat_src.parquet"
    pdf = pd.DataFrame(
        {
            "C": pd.Categorical(["A", "B", "A"], categories=list("ABC")),
            "v": [1, 2, 3],
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), src)

    df = spark.read.parquet(src)
    assert dict(df.dtypes)["C"] == "string"  # dictionary-encoded -> string

    t = TableRepo(f"{tmp_root}/cat_tbl", group_cols="C")
    t.extend(df)
    dirs = {d for d in os.listdir(t.main_path) if "=" in d}
    assert dirs == {"C=A", "C=B"}  # empty category "C" gets no dir
    back = t.get_full_df().toPandas().sort_values("v").reset_index(drop=True)
    assert list(back["C"]) == ["A", "B", "A"]
    assert list(back["v"]) == [1, 2, 3]


def test_single_writer_append_roundtrip(spark, tmp_root):
    """single_writer=True appends go through the plain committer (one write
    job, no staging/rename commit) and compose across calls."""
    t = TableRepo(f"{tmp_root}/sw", group_cols="c", single_writer=True)
    df1 = spark.createDataFrame([(1, "x", 1.0), (2, "y", 2.0)], "k int, c string, v double")
    df2 = spark.createDataFrame([(3, "x", 3.0)], "k int, c string, v double")
    t.extend(df1)
    t.extend(df2)
    assert {"c=x", "c=y"} <= set(os.listdir(t.main_path))
    back = sorted(tuple(r) for r in t.get_full_df().select("k", "c", "v").collect())
    assert back == [(1, "x", 1.0), (2, "y", 2.0), (3, "x", 3.0)]
    # no staging leftovers on the happy path
    assert not [d for d in os.listdir(t.main_path) if d.startswith(".pqrs_staging")]


def test_zorder_tightens_both_dimensions(spark, tmp_root):
    """Z-order clustering on two independent keys: per-file spans shrink
    on BOTH dimensions, where lexicographic clustering leaves the second
    key's span at ~full range in every file."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    df = (
        spark.range(16000)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(10000)).alias("a"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10000)).alias("b"),
        )
        .repartition(2)
    )

    def spans(t, col_idx):
        out = []
        for p in t.paths:
            f = pq.ParquetFile(p)
            for rg in range(f.metadata.num_row_groups):
                st = f.metadata.row_group(rg).column(col_idx).statistics
                out.append(st.max - st.min)
        return out

    lex = TableRepo(f"{tmp_root}/lex", max_records=250, cluster_by=["a", "b"])
    lex.extend(df)
    zed = TableRepo(
        f"{tmp_root}/zed", max_records=250, cluster_by=["a", "b"], cluster_algo="zorder"
    )
    zed.extend(df)

    # column order in written files: a at index 0, b at index 1
    assert sum(spans(zed, 1)) < sum(spans(lex, 1)) / 2  # b: z-order wins big
    assert sum(spans(zed, 0)) < 0.8 * 10000 * len(zed.paths)  # a keeps locality too
    assert zed.get_full_df().count() == 16000
    # same rows either way
    assert sorted(map(tuple, zed.get_full_df().collect())) == sorted(
        map(tuple, lex.get_full_df().collect())
    )


def test_zorder_degenerate_batches_fall_back(spark, tmp_root):
    """Empty batches, all-NULL keys, and string keys must not crash a
    zorder table's append — they fall back to lexicographic clustering."""
    from pyspark.sql import functions as F

    t = TableRepo(f"{tmp_root}/zdeg", cluster_by=["a", "b"], cluster_algo="zorder")
    df = spark.createDataFrame([(1, 2.0), (3, None), (5, 6.0)], "a long, b double")
    t.extend(df)                      # NULL value in a key column
    t.extend(df.where(F.lit(False)))  # empty batch
    t.extend(df.withColumn("b", F.lit(None).cast("double")))  # all-NULL key
    assert t.get_full_df().count() == 6
    ts = TableRepo(f"{tmp_root}/zstr", cluster_by=["c", "d"], cluster_algo="zorder")
    ts.extend(spark.createDataFrame([("x", "y"), ("p", "q")], "c string, d string"))
    assert ts.get_full_df().count() == 2


def test_load_normalizes_both_events_ts_generations(spark, tmp_path):
    """The driver's testdata has shipped events.ts as TIMESTAMP(NANOS) in
    some generations and TIMESTAMP(MICROS) in others; load() must present
    epoch-nanos longs for BOTH (the round-3 drift broke 11 queries)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquetranger_spark.queries.common import load

    base = 1_700_000_000_000_000_000  # epoch nanos
    for unit, vals in [("ns", [base, base + 1000]), ("us", [base // 1000, base // 1000 + 1])]:
        d = tmp_path / f"gen_{unit}"
        d.mkdir()
        t = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(vals, pa.timestamp(unit)),
            }
        )
        pq.write_table(t, str(d / "events.parquet"))
        out = load(spark, str(d), "events")
        assert dict(out.dtypes)["ts"] == "bigint", (unit, out.dtypes)
        got = sorted(r.ts for r in out.collect())
        # ns gen: [base, base+1000ns]; us gen: [base, base+1us] → same nanos
        assert got == [base, base + 1000], (unit, got)


def test_delete_records_prunes_to_matched_partitions(spark, sf_dir, tmp_path):
    t = TableRepo(
        str(tmp_path) + "/li",
        group_cols="l_returnflag",
        index_cols=["l_orderkey", "l_linenumber"],
        spark=spark,
    )
    li = load(spark, sf_dir, "lineitem")
    t.extend(li)
    # keys are GLOBAL (pandas-index semantics): pick victims whose key
    # lives only in the A partition so exactly one partition is touched
    only_a = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count_distinct("l_returnflag").alias("nf"), F.min("l_returnflag").alias("f"))
        .where("nf = 1 AND f = 'A'")
    )
    victims = only_a.select("l_orderkey", "l_linenumber").limit(20)
    vk = {tuple(r) for r in victims.collect()}
    # a key may cover several physical rows — expected loss is row count
    n_victim_rows = li.join(
        spark.createDataFrame(list(vk), "l_orderkey long, l_linenumber int"),
        ["l_orderkey", "l_linenumber"],
        "left_semi",
    ).count()
    before_n = {p for p in t.paths if "l_returnflag=N" in p}
    n0 = t.get_full_df().count()
    t.delete_records(victims)
    # untouched partition's files not rewritten
    assert {p for p in t.paths if "l_returnflag=N" in p} == before_n
    got = t.get_full_df()
    assert got.count() == n0 - n_victim_rows
    left = {
        tuple(r)
        for r in got.select("l_orderkey", "l_linenumber")
        .join(spark.createDataFrame(list(vk), "l_orderkey long, l_linenumber int"), ["l_orderkey", "l_linenumber"], "left_semi")
        .collect()
    }
    assert left == set()


def test_delete_where_clears_emptied_partition(spark, sf_dir, tmp_path):
    t = TableRepo(
        str(tmp_path) + "/li",
        group_cols="l_returnflag",
        index_cols=["l_orderkey", "l_linenumber"],
        spark=spark,
    )
    li = load(spark, sf_dir, "lineitem")
    t.extend(li)
    n_a = li.where("l_returnflag = 'A'").count()
    n0 = t.get_full_df().count()
    t.delete_where(F.col("l_returnflag") == "A")
    got = t.get_full_df()
    assert got.count() == n0 - n_a
    assert got.where("l_returnflag = 'A'").count() == 0
    # the emptied partition directory is gone, not a zero-row husk
    assert not [p for p in t.paths if "l_returnflag=A" in p]


def test_delete_where_ungrouped_and_null_predicate_rows_kept(spark, tmp_path):
    import pandas as pd

    t = TableRepo(str(tmp_path) + "/t", spark=spark)
    pdf = pd.DataFrame({"k": [1, 2, 3, 4], "v": [1.0, None, 3.0, 4.0]})
    t.extend(spark.createDataFrame(pdf))
    t.delete_where(F.col("v") > 2.5)  # NULL predicate rows must survive
    got = sorted(r["k"] for r in t.get_full_df().collect())
    assert got == [1, 2]


def test_compression_codec_per_repo(spark, sf_dir, tmp_path):
    """compression= pins the parquet codec for every file the repo writes
    (zstd for cold write-once tables, default snappy for hot appends);
    read-back is codec-transparent."""
    li = load(spark, sf_dir, "lineitem").limit(5000)
    tz = TableRepo(str(tmp_path) + "/z", group_cols="l_returnflag",
                   compression="zstd", single_writer=True, spark=spark)
    ts = TableRepo(str(tmp_path) + "/s", group_cols="l_returnflag",
                   single_writer=True, spark=spark)
    tz.extend(li)
    ts.extend(li)
    assert all(p.endswith(".zstd.parquet") for p in tz.paths), tz.paths[:2]
    assert all(p.endswith(".snappy.parquet") for p in ts.paths), ts.paths[:2]
    assert tz.get_full_df().count() == ts.get_full_df().count() == 5000
    z_bytes = sum(os.path.getsize(p) for p in tz.paths)
    s_bytes = sum(os.path.getsize(p) for p in ts.paths)
    assert z_bytes < s_bytes  # zstd beats snappy on this data


def test_stats_per_partition(spark, sf_dir, tmp_path):
    """stats() reports per-partition rows/files/bytes from the scan's
    _metadata column — values must agree with the driver-side surfaces."""
    t = TableRepo(str(tmp_path) + "/li", group_cols="l_returnflag",
                  single_writer=True, spark=spark)
    li = load(spark, sf_dir, "lineitem")
    t.extend(li)
    got = {r["l_returnflag"]: r for r in t.stats().collect()}
    exp = {r["l_returnflag"]: r["n"] for r in
           li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {k: v["n_rows"] for k, v in got.items()} == exp
    assert sum(v["n_files"] for v in got.values()) == t.n_files
    assert sum(v["n_bytes"] for v in got.values()) == sum(
        os.path.getsize(p) for p in t.paths
    )


def test_map_partitions_arrow_matches_pandas(spark, tmp_root):
    """map_partitions_arrow: same grouping semantics, pyarrow.Table in and
    out (zero pandas conversion), results equal to the pandas flavor."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = TableRepo(f"{tmp_root}/t", group_cols="C", index_cols="__index")
    t.extend(spark.createDataFrame(DF1))
    t.extend(spark.createDataFrame(DF2))

    def arrow_agg(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "C": [tbl["C"][0].as_py()],
                "sum_a": [pc.sum(tbl["A"]).as_py()],
                "n": [tbl.num_rows],
            }
        )

    got = {
        (r["C"], r["sum_a"], r["n"])
        for r in t.map_partitions_arrow(arrow_agg, "C long, sum_a long, n long").collect()
    }
    pdf = pd.concat([DF1, DF2])
    want = {
        (c, int(g.A.sum()), len(g)) for c, g in pdf.groupby("C")
    }
    assert got == want


def test_as_view_sql_front_door(spark, tmp_root):
    t = TableRepo(f"{tmp_root}/viewt", group_cols="C", index_cols="__index")
    t.extend(spark.createDataFrame(DF1))
    v = t.as_view()
    got = spark.sql(f"SELECT C, count(*) AS n FROM {v} GROUP BY C ORDER BY C")
    assert [(r["C"], r["n"]) for r in got.collect()] == [(1, 2), (2, 1)]
    # pruning works through the view: partition filter reaches the scan
    p = spark.sql(f"SELECT * FROM {v} WHERE C = 1")._jdf.queryExecution().executedPlan().toString()
    seg = p.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "C" in seg


def test_ignore_corrupt_files_read(spark, tmp_root):
    """get_full_df(ignore_corrupt_files=True) skips unreadable files (the
    disaster-recovery read); the default read fails loudly."""
    t = TableRepo(f"{tmp_root}/cor", group_cols="C", index_cols="__index")
    t.extend(spark.createDataFrame(DF1))  # C ∈ {1, 2}
    victim = [p for p in t.paths if "C=2" in p][0]
    with open(victim, "wb") as f:
        f.write(b"not parquet at all")
    with pytest.raises(Exception):
        t.get_full_df().count()
    got = t.get_full_df(ignore_corrupt_files=True)
    assert sorted(r["__index"] for r in got.collect()) == ["a1", "a3"]


def test_ignore_corrupt_files_without_sidecar(spark, tmp_root):
    """The recovery read must work on the no-sidecar path too — the
    disaster that takes a file can take the sidecar with it."""
    import shutil

    t = TableRepo(f"{tmp_root}/cor2", group_cols="C", index_cols="__index")
    t.extend(spark.createDataFrame(DF1))
    victim = [p for p in t.paths if "C=2" in p][0]
    with open(victim, "wb") as f:
        f.write(b"garbage")
    # lose the sidecar as well
    for fn in os.listdir(t.main_path):
        if fn.endswith(".json"):
            os.remove(os.path.join(t.main_path, fn))
    got = t.get_full_df(ignore_corrupt_files=True)
    assert sorted(r["__index"] for r in got.collect()) == ["a1", "a3"]


def test_check_constraints_gate_every_write_path(spark, tmp_root):
    """Named CHECK constraints reject a violating batch WHOLE before any
    file lands (SQL semantics: NULL passes); clean batches write
    normally on extend, upsert, and replace_all."""
    import pandas as pd
    import pytest

    from parquetranger_spark import TableRepo

    t = TableRepo(
        f"{tmp_root}/ck",
        group_cols="c",
        index_cols="k",
        constraints={"positive_a": "a > 0", "known_c": "c IN ('x', 'y')"},
        spark=spark,
    )
    good = pd.DataFrame({"k": ["1", "2"], "a": [5, None], "c": ["x", "y"]})
    t.extend(spark.createDataFrame(good))  # NULL a passes CHECK
    assert t.get_full_df().count() == 2
    bad = pd.DataFrame({"k": ["3", "4"], "a": [7, -1], "c": ["x", "x"]})
    with pytest.raises(ValueError, match="positive_a"):
        t.extend(spark.createDataFrame(bad))
    assert t.get_full_df().count() == 2  # nothing landed
    worse = pd.DataFrame({"k": ["3"], "a": [-2], "c": ["z"]})
    with pytest.raises(ValueError, match="rows"):
        t.replace_records(spark.createDataFrame(worse))
    with pytest.raises(ValueError, match="known_c"):
        t.replace_all(spark.createDataFrame(pd.DataFrame({"k": ["9"], "a": [1], "c": ["z"]})))
    assert sorted(r["k"] for r in t.get_full_df().collect()) == ["1", "2"]


def test_check_constraints_drop_mode(spark, tmp_root):
    """constraint_mode='drop' (the expect_or_drop shape): violating rows
    are filtered from the write, clean rows land, and per-constraint
    drop counts surface in last_constraint_drops."""
    import pandas as pd
    import pytest

    from parquetranger_spark import TableRepo

    t = TableRepo(
        f"{tmp_root}/ckd",
        index_cols="k",
        constraints={"positive_a": "a > 0", "short_k": "length(k) <= 2"},
        constraint_mode="drop",
        spark=spark,
    )
    batch = pd.DataFrame(
        {"k": ["1", "2", "bad3", "4"], "a": [5, -1, 9, None]}
    )
    t.extend(spark.createDataFrame(batch))
    assert t.last_constraint_drops == {"positive_a": 1, "short_k": 1}
    assert sorted(r["k"] for r in t.get_full_df().collect()) == ["1", "4"]
    t.extend(spark.createDataFrame(pd.DataFrame({"k": ["5"], "a": [1]})))
    assert t.last_constraint_drops == {}
    assert t.get_full_df().count() == 3
    with pytest.raises(ValueError, match="constraint_mode"):
        TableRepo(f"{tmp_root}/bad", constraints={"x": "1=1"}, constraint_mode="warn", spark=spark)


def test_merge_update_delete_insert(spark, tmp_path):
    """MERGE INTO: conditional update + conditional delete + insert in
    one pass, grouped table, partition-pruned rewrite."""
    t = TableRepo(
        str(tmp_path / "m"), group_cols="g", index_cols="k", spark=spark
    )
    t.extend(
        spark.createDataFrame(
            pd.DataFrame(
                {"k": ["a", "b", "c", "d"], "g": ["x", "x", "y", "y"],
                 "v": [1, 2, 3, 4]}
            )
        )
    )
    src = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a", "c", "e"], "g": ["x", "y", "x"], "v": [10, -1, 50]}
        )
    )
    t.merge(
        src,
        update={"v": "tgt.v + src.v"},
        delete_condition="src.v < 0",
        insert=True,
    )
    got = {r["k"]: (r["g"], r["v"]) for r in t.get_full_df().collect()}
    assert got == {
        "a": ("x", 11),   # matched, updated: 1 + 10
        "b": ("x", 2),    # untouched target
        "d": ("y", 4),    # untouched target
        "e": ("x", 50),   # unmatched source, inserted
    }  # "c" deleted (src.v < 0)


def test_merge_update_all_and_no_insert(spark, tmp_path):
    t = TableRepo(str(tmp_path / "m2"), index_cols="k", spark=spark)
    t.extend(spark.createDataFrame(pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})))
    src = spark.createDataFrame(pd.DataFrame({"k": ["b", "z"], "v": [20, 99]}))
    t.merge(src, update="all", insert=False)
    got = {r["k"]: r["v"] for r in t.get_full_df().collect()}
    assert got == {"a": 1, "b": 20}  # z NOT inserted


def test_merge_update_condition_and_dup_source_keeps_first(spark, tmp_path):
    t = TableRepo(str(tmp_path / "m3"), index_cols="k", spark=spark)
    t.extend(spark.createDataFrame(pd.DataFrame({"k": ["a", "b"], "v": [5, 5]})))
    src = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 100, 3]})
    )
    # only update when the source value is LOWER (min-merge)
    t.merge(src, update="all", update_condition="src.v < tgt.v", insert=False)
    got = {r["k"]: r["v"] for r in t.get_full_df().collect()}
    assert got == {"a": 1, "b": 3}  # a: first dup (1) wins then updates


def test_merge_rejects_key_and_group_updates(spark, tmp_path):
    t = TableRepo(str(tmp_path / "m4"), group_cols="g", index_cols="k", spark=spark)
    t.extend(spark.createDataFrame(pd.DataFrame({"k": ["a"], "g": ["x"], "v": [1]})))
    src = spark.createDataFrame(pd.DataFrame({"k": ["a"], "g": ["x"], "v": [2]}))
    with pytest.raises(ValueError, match="key/group"):
        t.merge(src, update={"k": "src.k"})
    with pytest.raises(ValueError, match="key/group"):
        t.merge(src, update={"g": "src.g"})


def test_merge_delete_empties_partition(spark, tmp_path):
    t = TableRepo(str(tmp_path / "m5"), group_cols="g", index_cols="k", spark=spark)
    t.extend(
        spark.createDataFrame(
            pd.DataFrame({"k": ["a", "b"], "g": ["x", "y"], "v": [1, 2]})
        )
    )
    src = spark.createDataFrame(pd.DataFrame({"k": ["b"], "g": ["y"], "v": [0]}))
    t.merge(src, update=None, delete_condition="true", insert=False)
    got = {r["k"] for r in t.get_full_df().collect()}
    assert got == {"a"}
    # the emptied partition directory is actually gone
    import os as _os

    assert not _os.path.isdir(_os.path.join(str(tmp_path / "m5"), "g=y"))
