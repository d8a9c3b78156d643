"""Round-5 hardening: prune-aware RMW conflict detection, SQL-MERGE
NULL-condition semantics, monotone AS-OF stamps under clock skew, the
once-per-read deletion-vector subtree, cached spilled-manifest payloads,
and unhinted (AQE-degradable) key-set joins in merge/delete/upsert."""

import json
import time

import pandas as pd
import pytest

from parquetranger_spark import TableRepo
from parquetranger_spark.sources import manifest as mf_mod
from parquetranger_spark.sources.manifest import load_manifest
from parquetranger_spark.sources.table_repo import ConcurrentWriteError


def _frame(lo: int, n: int = 6):
    return pd.DataFrame(
        {
            "k": [f"k{i}" for i in range(lo, lo + n)],
            "A": list(range(lo, lo + n)),
            "C": [str((lo + i) % 3) for i in range(n)],
        }
    )


def _repo(spark, root, **kw):
    kw.setdefault("group_cols", "C")
    return TableRepo(
        root, index_cols="k", commit_mode="manifest", spark=spark, **kw
    )


def test_rmw_conflict_on_prune_only_commit(spark, tmp_root):
    """A concurrent operation that only REMOVES rows (delete / merge
    emptying files — the manifest diff is prune-only: no new dirs) must
    conflict with a rewrite computed from the pre-delete snapshot, or
    the rewrite would silently resurrect the deleted rows."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0, 9)))
    stale = t._rmw_baseline()

    # concurrent DELETE lands after the snapshot: prune-only commit
    # (copy-on-write delete of every C='0' row empties that partition —
    # dirs only vanish / shrink, none are added)
    t.delete_where("C = '0'")

    # a rewrite of C='0' computed from the stale snapshot must refuse —
    # publishing would resurrect the deleted k0/k3/k6 rows
    upd = spark.createDataFrame(
        pd.DataFrame({"k": ["k0"], "A": [7], "C": ["0"]})
    )
    with pytest.raises(ConcurrentWriteError, match="resurrect|rerun"):
        t._write(upd, mode="overwrite", dynamic=True, rmw_baseline=stale)

    # removals in partitions the rewrite does NOT touch stay invisible
    upd1 = spark.createDataFrame(
        pd.DataFrame({"k": ["k1"], "A": [7], "C": ["1"]})
    )
    t._write(upd1, mode="overwrite", dynamic=True, rmw_baseline=stale)

    # and a static rewrite conflicts on ANY removal
    t2 = _repo(spark, f"{tmp_root}/t2", group_cols=None)
    t2.extend(spark.createDataFrame(_frame(0, 6).drop(columns=["C"])))
    stale2 = t2._rmw_baseline()
    t2.delete_where("A >= 3")
    with pytest.raises(ConcurrentWriteError):
        t2._write(
            spark.createDataFrame(pd.DataFrame({"k": ["k9"], "A": [9]})),
            mode="overwrite",
            dynamic=False,
            rmw_baseline=stale2,
        )


def test_rmw_self_prune_still_publishes(spark, tmp_root):
    """Regression guard for the prune-aware check: a keyed upsert that
    MOVES every key out of a partition prunes that partition itself
    (publish, then a drop-emptied commit) — its own removals must not
    read as a conflict, serially or under real concurrency."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0, 3)))  # k0/k1/k2 in C 0/1/2
    # move k0 from C='0' to C='1': empties partition 0 entirely
    t.replace_records(
        spark.createDataFrame(pd.DataFrame({"k": ["k0"], "A": [100], "C": ["1"]}))
    )
    got = {(r["k"], r["C"]) for r in t.get_full_df().collect()}
    assert got == {("k0", "1"), ("k1", "1"), ("k2", "2")}
    # merge-driven delete emptying a partition also self-publishes fine
    t.merge(
        spark.createDataFrame(pd.DataFrame({"k": ["k2"], "A": [0], "C": ["2"]})),
        update=None,
        delete_condition="tgt.A >= 0",
        insert=False,
    )
    assert {r["k"] for r in t.get_full_df().collect()} == {"k0", "k1"}


def test_merge_null_update_condition_not_taken(spark, tmp_root):
    """SQL MERGE treats an UNKNOWN (NULL) clause condition as not taken:
    a matched row whose update_condition evaluates to NULL is kept
    unchanged — same rule the delete clause already applied."""
    t = _repo(spark, f"{tmp_root}/t", group_cols=None)
    t.extend(
        spark.createDataFrame(
            pd.DataFrame({"k": ["a", "b"], "A": [1, 2], "C": ["0", "0"]})
        )
    )
    src = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "b"], "A": [pd.NA, 50], "C": ["0", "0"]}).astype(
            {"A": "Int64"}
        )
    )
    t.merge(src, update="all", update_condition="src.A > 10", insert=False)
    got = {r["k"]: r["A"] for r in t.get_full_df().collect()}
    # 'a': condition NULL (src.A NULL) → NOT updated; 'b': 50 > 10 → updated
    assert got == {"a": 1, "b": 50}


def test_commit_ts_monotone_under_clock_skew(spark, tmp_root, monkeypatch):
    """AS-OF stamps are clamped to the previous version's stamp, so a
    committer with a lagging wall clock cannot publish a version whose
    ts is LOWER than its predecessor's (which would make version_at
    resolve an instant to a snapshot that was never visible then)."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0)))
    real = time.time
    # second committer's clock runs 1h behind
    monkeypatch.setattr(mf_mod.time, "time", lambda: real() - 3600.0)
    t.extend(spark.createDataFrame(_frame(6)))
    monkeypatch.setattr(mf_mod.time, "time", real)
    fs = t._fs()
    ts = [
        json.loads(fs.read_text(mf_mod._mpath(t.main_path, v)))["ts"]
        for v in t.versions()
    ]
    assert ts == sorted(ts), f"non-monotone stamps: {ts}"
    assert ts[1] >= ts[0]
    # and the resolver picks the later version for a now-instant
    assert t.version_at(real()) == 2


def test_dv_subtree_folded_once_per_read(spark, tmp_root):
    """The (key -> max dv position) tombstone frame is materialized once
    per _manifest_df call: the dv parquet paths must not appear in the
    read plan at all (each union branch joins the checkpointed RDD), and
    merge-on-read semantics are unchanged."""
    t = _repo(spark, f"{tmp_root}/t")
    for lo in (0, 6, 12):  # three data commits -> three union branches
        t.extend(spark.createDataFrame(_frame(lo)))
    t.delete_records_dv(
        spark.createDataFrame(pd.DataFrame({"k": ["k1", "k7"]}))
    )
    t.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["k13"]})))
    mf = load_manifest(t._fs(), t.main_path)
    dv_dirs = [c["dir"] for c in mf["commits"] if c.get("kind") == "dv"]
    assert len(dv_dirs) == 2
    df = t.get_full_df()
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for d in dv_dirs:
        assert d not in plan, f"dv scan {d} re-derived inside the read plan"
    kept = sorted(r["k"] for r in df.collect())
    assert "k1" not in kept and "k7" not in kept and "k13" not in kept
    assert len(kept) == 15
    # upsert-after-delete still survives (position-aware tombstones)
    t.extend(spark.createDataFrame(pd.DataFrame({"k": ["k1"], "A": [99], "C": ["1"]})))
    assert ("k1", 99) in {(r["k"], r["A"]) for r in t.get_full_df().collect()}


def test_spilled_payload_resolved_once(spark, tmp_root):
    """Spilled file lists (manifest-of-manifests tier) are immutable, so
    load_manifest serves them from a process-wide cache — the second
    load performs ZERO reads of lists/ objects."""
    t = _repo(spark, f"{tmp_root}/t", manifest_inline_files_max=1)
    t.extend(spark.createDataFrame(_frame(0, 9)))  # 3 partitions > 1 file cap
    fs = t._fs()
    mf1 = load_manifest(fs, t.main_path)
    assert any("files_ref" in c for c in mf1["commits"])

    calls = []
    real_read = fs.read_text

    def counting_read(path):
        if "/lists/" in path:
            calls.append(path)
        return real_read(path)

    fs.read_text = counting_read
    try:
        mf2 = load_manifest(fs, t.main_path)
    finally:
        fs.read_text = real_read
    assert calls == [], f"spilled payload re-read: {calls}"
    assert [c["files"] for c in mf2["commits"]] == [
        c["files"] for c in mf1["commits"]
    ]


def test_table_sized_source_degrades_to_shuffle_join(spark, tmp_root):
    """merge/delete/upsert no longer force-broadcast the incoming key
    set: under a zero broadcast threshold the plan degrades to a shuffle
    join and the operation still completes correctly (a table-sized
    source must never OOM the driver via a mandatory broadcast)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = _repo(spark, f"{tmp_root}/t")
        t.extend(spark.createDataFrame(_frame(0, 30)))
        big = pd.DataFrame(
            {
                "k": [f"k{i}" for i in range(0, 30, 2)],
                "A": [1000 + i for i in range(0, 30, 2)],
                "C": [str(i % 3) for i in range(0, 30, 2)],
            }
        )
        t.merge(spark.createDataFrame(big), update="all")
        got = {r["k"]: r["A"] for r in t.get_full_df().collect()}
        assert got["k0"] == 1000 and got["k1"] == 1
        t.delete_records(spark.createDataFrame(pd.DataFrame({"k": ["k0", "k1"]})))
        assert "k0" not in {r["k"] for r in t.get_full_df().collect()}
        t.replace_records(
            spark.createDataFrame(pd.DataFrame({"k": ["k2"], "A": [5], "C": ["2"]}))
        )
        assert {r["A"] for r in t.get_full_df().where("k = 'k2'").collect()} == {5}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_stream_manifest_uri_root(spark, tmp_root, tmp_path):
    """The manifest streaming source resolves paths through pyarrow.fs,
    so a file:// URI root (any URI TableRepo can write) streams the same
    rows as a plain-path root — and a scheme pyarrow cannot reach is
    refused loudly at read time, never a silently-empty stream."""
    t = TableRepo(
        f"file://{tmp_root}/t", group_cols="C", index_cols="k",
        commit_mode="manifest", spark=spark,
    )
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ckpt"
    q = (
        t.stream_manifest()
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted((r["k"], r["A"], r["C"]) for r in spark.read.parquet(out).collect())
    want = sorted(
        (r["k"], r["A"], r["C"])
        for r in spark.createDataFrame(_frame(0, 12)).collect()
    )
    assert got == want

    # unreachable scheme: loud refusal from the pyarrow.fs resolution
    from parquetranger_spark.sources.manifest_stream import manifest_stream_source

    simple, _ = manifest_stream_source()
    import pytest as _pytest

    with _pytest.raises(Exception, match="unreachable|Unrecognized|scheme"):
        reader_cls = None
        ds = simple(options={
            "root": "nosuchscheme://bucket/path",
            "cols": "k", "col_types": "string", "schema_ddl": "k string",
        })
        ds.simpleStreamReader("k string")


def test_knn_density_one_row_per_vector(spark):
    """knn_density_ivf's contract — one (id, knn_cos) row per input
    vector — holds at every corpus size and in both tiers: a corpus of
    n <= k vectors has no kth neighbor, so every row surfaces with a
    NULL density (reads as maximally isolated) instead of vanishing;
    rerank=None likewise emits starved vectors with NULL."""
    from parquetranger_spark.operators.similarity import knn_density_ivf

    tiny = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    got = knn_density_ivf(tiny, k=5, n_lists=16, n_probe=2, rerank=10).collect()
    assert sorted(r["vec_id"] for r in got) == [0, 1, 2, 3]
    assert all(r["knn_cos"] is None for r in got)

    est_only = knn_density_ivf(tiny, k=5, n_lists=16, n_probe=2, rerank=None).collect()
    assert sorted(r["vec_id"] for r in est_only) == [0, 1, 2, 3]


def test_stream_changes_starting_version(spark, tmp_root, tmp_path):
    """starting_version semantics of the CDF stream: 'latest' emits only
    versions committed after stream creation; 'earliest' on a vacuumed
    table bootstraps the oldest retained version as a full snapshot of
    inserts (its predecessor manifest is gone) and then streams true
    deltas."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0, 3)))   # v1
    t.extend(spark.createDataFrame(_frame(3, 3)))   # v2

    def drain(df, out, ckpt):
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # latest: the two existing versions do NOT stream...
    lat = t.stream_changes(starting_version="latest")
    drain(lat, f"{tmp_path}/lat", f"{tmp_path}/lat_ck")
    import os as _os

    n0 = (
        spark.read.parquet(f"{tmp_path}/lat").count()
        if _os.path.exists(f"{tmp_path}/lat/_SUCCESS") or _os.listdir(f"{tmp_path}/lat")
        else 0
    )
    assert n0 == 0
    # ...but a commit made afterwards does
    t.extend(spark.createDataFrame(_frame(6, 2)))   # v3
    drain(
        t.stream_changes(starting_version="latest"),
        f"{tmp_path}/lat",
        f"{tmp_path}/lat_ck",
    )
    got = {(r["k"], r["_change_type"], r["_commit_version"])
           for r in spark.read.parquet(f"{tmp_path}/lat").collect()}
    assert got == {("k6", "insert", 3), ("k7", "insert", 3)}

    # earliest after vacuum: v1/v2 manifests pruned; the feed bootstraps
    # the oldest retained version as inserts, then streams new deltas
    t.vacuum(max_age_seconds=0, keep_versions=1)
    assert t.versions() == [3]
    ear = t.stream_changes(starting_version="earliest")
    drain(ear, f"{tmp_path}/ear", f"{tmp_path}/ear_ck")
    got2 = sorted(
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(f"{tmp_path}/ear").collect()
    )
    # v3's manifest carries the FULL live file set (k0..k7): bootstrap
    # replays all of it as version-3 inserts
    assert got2 == [(f"k{i}", "insert", 3) for i in range(8)]
    # default (from version 1) on the vacuumed table refuses loudly
    import pytest as _pytest

    with _pytest.raises(Exception, match="vacuumed|gone"):
        drain(
            t.stream_changes(),
            f"{tmp_path}/def",
            f"{tmp_path}/def_ck",
        )
