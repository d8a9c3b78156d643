"""Incrementally-maintained materialized aggregate views
(sources/matview.py): refresh folds the source's row-level change feed
into a keyed state table; after every refresh the view must equal a
one-shot aggregate of the source — whatever mix of appends, upserts,
copy-on-write updates, dv deletes, and predicate deletes produced the
history."""

import pandas as pd
import pytest

from parquetranger_spark.sources.matview import MaterializedAggView
from parquetranger_spark.sources.table_repo import TableRepo


def _source(spark, root):
    return TableRepo(
        root + "/src",
        group_cols="g",
        index_cols=["k"],
        commit_mode="manifest",
        spark=spark,
    )


def _dest(spark, root, grouped=False):
    return TableRepo(
        root + "/mv",
        group_cols="g" if grouped else None,
        index_cols=["g"],
        commit_mode="manifest",
        spark=spark,
    )


def _mv(spark, root, grouped=False, **kw):
    src = _source(spark, root)
    kw.setdefault("sums", {"total": "v"})
    kw.setdefault("avgs", {"mean_v": "v"})
    kw.setdefault("mins", {"lo": "v"})
    kw.setdefault("maxs", {"hi": "v"})
    mv = MaterializedAggView(
        src, _dest(spark, root, grouped), group_cols=["g"], **kw
    )
    return src, mv


def _rows(n, start=0, gmod=3, vmul=1.0):
    return pd.DataFrame(
        {
            "k": [f"k{i}" for i in range(start, start + n)],
            "g": [str(i % gmod) for i in range(start, start + n)],
            "v": [float(i) * vmul for i in range(start, start + n)],
        }
    )


def assert_matches_recompute(mv):
    got = sorted(tuple(r) for r in mv.read().collect())
    want = sorted(tuple(r) for r in mv.full_recompute_df().collect())
    assert got == want


def test_bootstrap_and_append_refresh(spark, tmp_root):
    src, mv = _mv(spark, tmp_root)
    src.extend(spark.createDataFrame(_rows(9)))
    v = mv.refresh()
    assert v == 1
    assert_matches_recompute(mv)
    src.extend(spark.createDataFrame(_rows(6, start=9)))
    mv.refresh()
    assert_matches_recompute(mv)


def test_refresh_idempotent_and_noop(spark, tmp_root):
    src, mv = _mv(spark, tmp_root)
    src.extend(spark.createDataFrame(_rows(9)))
    v1 = mv.refresh()
    v2 = mv.refresh()  # nothing new
    assert v1 == v2 == mv.last_refreshed()
    assert_matches_recompute(mv)


def test_upsert_and_cow_update_flow_through(spark, tmp_root):
    src, mv = _mv(spark, tmp_root)
    src.extend(spark.createDataFrame(_rows(9)))
    mv.refresh()
    # keyed upsert rewrites rows → update pre/post image pairs
    src.replace_records(spark.createDataFrame(_rows(3, vmul=100.0)))
    # copy-on-write UPDATE → same
    src.update_where({"v": "v + 0.5"}, "k = 'k7'")
    mv.refresh()
    assert_matches_recompute(mv)


def test_dv_and_predicate_deletes_shrink_groups(spark, tmp_root):
    src, mv = _mv(spark, tmp_root)
    src.extend(spark.createDataFrame(_rows(9)))
    mv.refresh()
    src.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["k1", "k4"]})))
    src.delete_where("v >= 6")
    mv.refresh()
    assert_matches_recompute(mv)


def test_group_death_removes_view_row(spark, tmp_root):
    src, mv = _mv(spark, tmp_root)
    src.extend(spark.createDataFrame(_rows(9)))
    mv.refresh()
    src.delete_where("g = '2'")
    mv.refresh()
    assert mv.read().where("g = '2'").count() == 0
    assert_matches_recompute(mv)


def test_min_rescan_when_extremum_deleted(spark, tmp_root):
    """Deleting a group's current min must NOT leave the stale extremum:
    the group re-aggregates from the source snapshot."""
    src, mv = _mv(spark, tmp_root)
    src.extend(spark.createDataFrame(_rows(9)))
    mv.refresh()
    # k0 holds g=0's min (v=0.0) and k8 holds g=2's max (v=8.0)
    src.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["k0", "k8"]})))
    mv.refresh()
    got = {r["g"]: (r["lo"], r["hi"]) for r in mv.read().collect()}
    assert got["0"] == (3.0, 6.0)
    assert got["2"] == (2.0, 5.0)
    assert_matches_recompute(mv)


def test_null_group_keys_dropped(spark, tmp_root):
    src, mv = _mv(spark, tmp_root)
    df = _rows(6)
    df.loc[0, "g"] = None
    src.extend(spark.createDataFrame(df))
    mv.refresh()
    assert mv.read().where("g IS NULL").count() == 0
    assert_matches_recompute(mv)


def test_randomized_mutation_sequence(spark, tmp_root):
    """Property-style: a fixed pseudo-random append/upsert/update/delete
    sequence, refreshing at every step — the view must equal the
    recompute after each."""
    src, mv = _mv(spark, tmp_root)
    src.extend(spark.createDataFrame(_rows(12)))
    mv.refresh()
    steps = [
        lambda: src.extend(spark.createDataFrame(_rows(5, start=12))),
        lambda: src.replace_records(spark.createDataFrame(_rows(4, start=2, vmul=7.0))),
        lambda: src.update_where({"v": "v * 3"}, "g = '1'"),
        lambda: src.delete_where_dv("v > 40"),
        lambda: src.update_where_dv({"v": "v - 1"}, "g = '0'"),
        lambda: src.delete_records(
            spark.createDataFrame(pd.DataFrame({"k": ["k3", "k13"]}))
        ),
    ]
    for step in steps:
        step()
        mv.refresh()
        assert_matches_recompute(mv)


def test_multi_version_window_single_fenced_commit(spark, tmp_root):
    """Several source versions between refreshes fold as ONE dest commit
    (one fence), and the fence makes replay a no-op."""
    src, mv = _mv(spark, tmp_root)
    src.extend(spark.createDataFrame(_rows(9)))
    src.extend(spark.createDataFrame(_rows(3, start=9)))
    src.delete_where("k = 'k1'")
    dest_versions_before = len(mv.dest.versions())
    end = mv.refresh()
    assert len(mv.dest.versions()) == dest_versions_before + 1
    assert_matches_recompute(mv)
    # replay: re-applying the same window is fenced out
    mv.dest._apply_keyed_changes(
        None, mv.dest.get_full_df().limit(0), fence=(mv._fid, end)
    )
    assert_matches_recompute(mv)


def test_grouped_dest_partitioned_state(spark, tmp_root):
    src, mv = _mv(spark, tmp_root, grouped=True)
    src.extend(spark.createDataFrame(_rows(9)))
    mv.refresh()
    src.update_where({"v": "v + 10"}, "g = '1'")
    mv.refresh()
    assert_matches_recompute(mv)


def test_guards(spark, tmp_root):
    src = _source(spark, tmp_root)
    bad_dest = TableRepo(
        tmp_root + "/bad", index_cols=["x"], commit_mode="manifest", spark=spark
    )
    with pytest.raises(TypeError, match="index_cols"):
        MaterializedAggView(src, bad_dest, group_cols=["g"])
    files_dest = TableRepo(tmp_root + "/f", index_cols=["g"], spark=spark)
    with pytest.raises(TypeError, match="manifest"):
        MaterializedAggView(src, files_dest, group_cols=["g"])
    with pytest.raises(ValueError, match="duplicate"):
        MaterializedAggView(
            src,
            _dest(spark, tmp_root),
            group_cols=["g"],
            count_col="n",
            sums={"n": "v"},
        )


def test_refresh_stream_versions_feed(spark, tmp_root):
    from pyspark.sql import Row

    src = TableRepo(
        tmp_root + "/src", index_cols="k", commit_mode="manifest", spark=spark
    )
    src.extend(
        spark.createDataFrame([Row(k=i, g=f"g{i % 2}", v=float(i)) for i in range(8)])
    )
    mv = MaterializedAggView(
        src,
        TableRepo(tmp_root + "/mv", index_cols="g", commit_mode="manifest", spark=spark),
        group_cols="g",
        sums={"sum_v": "v"},
    )
    q = mv.refresh_stream(tmp_root + "/ck")
    q.awaitTermination(120)
    assert {r.g: r.sum_v for r in mv.read().collect()} == {"g0": 12.0, "g1": 16.0}
    # mutate + pump again through the SAME checkpoint: catch-up refresh
    src.replace_records(spark.createDataFrame([Row(k=1, g="g1", v=100.0)]))
    src.delete_records_dv(spark.createDataFrame([Row(k=2)]))
    q2 = mv.refresh_stream(tmp_root + "/ck")
    q2.awaitTermination(120)
    got = {r.g: r.sum_v for r in mv.read().collect()}
    assert got == {"g0": 10.0, "g1": 115.0}
    # a pump with NO new versions is a clean no-op
    v = mv.last_refreshed()
    q3 = mv.refresh_stream(tmp_root + "/ck")
    q3.awaitTermination(120)
    assert mv.last_refreshed() == v
