"""Manifest commit protocol (sources/manifest.py, TableRepo
commit_mode='manifest'): atomic CAS-published versions, snapshot
time travel, dynamic partition overwrite on the manifest, concurrent
append composition, and vacuum of superseded data dirs."""

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
import pytest

from parquetranger_spark import TableRepo
from parquetranger_spark.sources.manifest import MANIFEST_DIR, load_manifest


def _frame(lo: int, n: int = 6):
    return pd.DataFrame(
        {
            "k": [f"k{i}" for i in range(lo, lo + n)],
            "A": list(range(lo, lo + n)),
            "C": [str((lo + i) % 3) for i in range(n)],
        }
    )


def _repo(spark, root, **kw):
    return TableRepo(
        root, group_cols="C", index_cols="k", commit_mode="manifest", spark=spark, **kw
    )


def rows(df):
    return sorted((r["k"], r["A"], r["C"]) for r in df.collect())


def test_append_roundtrip_and_versions(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    assert rows(t.get_full_df()) == rows(spark.createDataFrame(_frame(0, 12)))
    assert t.versions() == [1, 2]
    # time travel: version 1 is exactly the first batch
    assert rows(t.get_full_df(version=1)) == rows(spark.createDataFrame(_frame(0)))
    with pytest.raises(KeyError):
        t.get_full_df(version=99)


def test_as_of_timestamp_travel(spark, tmp_root):
    """AS-OF timestamp resolution: each CAS publish stamps epoch seconds
    into the manifest; ``version_at``/``get_full_df(as_of=)`` resolve an
    instant to the snapshot live then (Delta timestampAsOf shape)."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0)))
    between = time.time()
    time.sleep(0.05)  # strictly separate the two publish stamps
    t.extend(spark.createDataFrame(_frame(6)))

    assert t.version_at(between) == 1
    assert rows(t.get_full_df(as_of=between)) == rows(spark.createDataFrame(_frame(0)))
    assert rows(t.get_full_df(as_of=time.time())) == rows(
        spark.createDataFrame(_frame(0, 12))
    )
    # datetime / ISO-8601 spellings resolve identically (naive = UTC)
    import datetime as dt

    when = dt.datetime.fromtimestamp(between, dt.timezone.utc)
    assert t.version_at(when) == 1
    assert t.version_at(when.isoformat()) == 1
    # before the table existed: loud error, not an empty frame
    with pytest.raises(ValueError):
        t.version_at(between - 3600)
    with pytest.raises(TypeError):
        t.get_full_df(version=1, as_of=between)
    # the audit log carries the stamps, monotone non-decreasing
    stamps = [h["ts"] for h in t.history()]
    assert all(isinstance(s, float) for s in stamps)
    assert stamps == sorted(stamps)


def test_files_df_metadata_table(spark, tmp_root):
    """files_df(): one row per live file with hive-parsed partition
    values, straight from the manifest — and version= reproduces an
    older snapshot's inventory."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    inv = t.files_df().collect()
    assert len(inv) == t.n_files
    assert all(r["kind"] == "data" for r in inv)
    assert all(r["partition"]["C"] in {"0", "1", "2"} for r in inv)
    assert all(f"C={r['partition']['C']}/" in r["file"] for r in inv)
    # rowcounts only recorded with stats_cols on — null here, not 0
    assert all(r["n_rows"] is None for r in inv)
    old = t.files_df(version=1).collect()
    assert len(old) < len(inv)
    with pytest.raises(KeyError):
        t.files_df(version=99)
    plain = TableRepo(f"{tmp_root}/p", group_cols="C", spark=spark)
    with pytest.raises(TypeError):
        plain.files_df()


def test_column_minmax_metadata_only(spark, tmp_root):
    """column_minmax()/count_rows() answer from the manifest alone: after
    deleting every data file on disk, the numbers still come back —
    proof the fast path opens zero files. Columns without recorded
    stats fall back to a real scan."""
    import glob
    import os

    t = TableRepo(
        f"{tmp_root}/t",
        group_cols="C",
        commit_mode="manifest",
        stats_cols="A",
        spark=spark,
    )
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    assert t.column_minmax("A") == (0, 11)
    # fallback path: k is not a stats column — real scan, same answer
    assert t.column_minmax("k") == ("k0", "k9")

    for p in glob.glob(f"{tmp_root}/t/_pqrs_data/*/*/*.parquet"):
        os.remove(p)
    assert t.column_minmax("A") == (0, 11)  # metadata-only: survives
    assert t.count_rows() == 12
    with pytest.raises(Exception):
        t.column_minmax("k")  # scan fallback now fails loudly


def test_no_directory_visibility_and_no_renames(spark, tmp_root):
    """Visibility is manifest-only: a naive reader listing the root sees
    nothing (data lives under underscore-hidden _pqrs_data), and the
    manifest references every written file in its ORIGINAL location —
    proving no rename happened."""
    root = f"{tmp_root}/t"
    t = _repo(spark, root)
    t.extend(spark.createDataFrame(_frame(0)))
    mf = load_manifest(t._fs(), t.main_path)
    assert mf["version"] == 1
    for c in mf["commits"]:
        assert c["dir"].startswith("_pqrs_data/")
        for f in c["files"]:
            assert os.path.exists(os.path.join(root, c["dir"], f))
    # the fs shim (like Spark's file index) hides underscore dirs
    assert t._fs().list_files(root, ".parquet") == []


def test_partition_pruned_read_and_partition_df(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0, 9)))
    got = t.get_partition_df("1")
    assert set(r["C"] for r in got.collect()) == {"1"}
    assert got.count() == 3


def test_dynamic_partition_overwrite_on_manifest(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0, 9)))  # C in {0,1,2}, 3 rows each
    new = pd.DataFrame({"k": ["x1", "x2"], "A": [100, 101], "C": ["1", "1"]})
    t.replace_groups(spark.createDataFrame(new))
    got = t.get_full_df()
    assert got.where("C = '1'").count() == 2
    assert got.where("C != '1'").count() == 6
    # old files still on disk (await vacuum), but not visible
    assert t.get_full_df(version=1).where("C = '1'").count() == 3


def test_replace_all_and_upsert(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0)))
    t.replace_all(spark.createDataFrame(_frame(20, 3)))
    assert rows(t.get_full_df()) == rows(spark.createDataFrame(_frame(20, 3)))
    upd = pd.DataFrame({"k": ["k20", "zz"], "A": [999, 5], "C": ["9", "0"]})
    t.replace_records(spark.createDataFrame(upd))
    got = dict((r["k"], (r["A"], r["C"])) for r in t.get_full_df().collect())
    assert got["k20"] == (999, "9") and got["zz"] == (5, "0") and len(got) == 4
    # k20 moved from C=2 to C=9; its old partition must not resurrect it
    assert t.get_full_df().where("C = '2' and k = 'k20'").count() == 0


def test_concurrent_appends_compose_via_cas_retry(spark, tmp_root):
    root = f"{tmp_root}/t"
    seed = _repo(spark, root)
    seed.extend(spark.createDataFrame(_frame(0, 1)))

    def worker(i):
        r = _repo(spark, root)
        r.extend(spark.createDataFrame(_frame(10 * (i + 1), 5)))

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(worker, range(4)))
    t = _repo(spark, root)
    assert t.get_full_df().count() == 1 + 4 * 5
    # every commit won a distinct version: 1 seed + 4 appends
    assert t.versions()[-1] == 5


def test_vacuum_sweeps_superseded_commits_and_manifests(spark, tmp_root):
    root = f"{tmp_root}/t"
    t = _repo(spark, root)
    t.extend(spark.createDataFrame(_frame(0)))
    t.replace_all(spark.createDataFrame(_frame(20, 3)))  # strands commit 1
    data_root = os.path.join(root, "_pqrs_data")
    assert len(os.listdir(data_root)) == 2
    # age the dirs past the cutoff
    for name in os.listdir(data_root):
        p = os.path.join(data_root, name)
        os.utime(p, (time.time() - 7200, time.time() - 7200))
    deleted = t.vacuum(max_age_seconds=3600)
    assert len(os.listdir(data_root)) == 1  # only the live commit survives
    # old manifest versions swept too; latest still readable
    assert t.versions() == [2]
    assert rows(t.get_full_df()) == rows(spark.createDataFrame(_frame(20, 3)))
    assert any("_pqrs_data" in d for d in deleted)


def test_crashed_commit_leaves_no_visible_data(spark, tmp_root):
    """Simulate a writer dying between data write and CAS: inject a data
    dir with no manifest entry — readers never see it, vacuum sweeps it."""
    root = f"{tmp_root}/t"
    t = _repo(spark, root)
    t.extend(spark.createDataFrame(_frame(0, 3)))
    orphan = os.path.join(root, "_pqrs_data", "deadbeefdeadbeef", "C=0")
    os.makedirs(orphan)
    spark.createDataFrame(_frame(50, 2)).drop("C").write.mode("overwrite").parquet(orphan)
    assert t.get_full_df().count() == 3
    past = time.time() - 7200
    os.utime(os.path.dirname(orphan), (past, past))
    t.vacuum(max_age_seconds=3600)
    assert not os.path.exists(os.path.dirname(orphan))


def test_cas_loser_retries_without_data_rewrite(spark, tmp_root):
    """Force a CAS loss: pre-create the version file the next commit will
    try, and check the commit lands at the version after it with the same
    single data dir (no second write of the batch)."""
    root = f"{tmp_root}/t"
    t = _repo(spark, root)
    t.extend(spark.createDataFrame(_frame(0, 2)))
    fs = t._fs()
    # squat on v2 with a copy of v1's manifest (a concurrent no-op commit)
    v1 = load_manifest(fs, t.main_path, 1)
    fs.create_exclusive(
        os.path.join(root, MANIFEST_DIR, f"v{2:020d}.json"),
        json.dumps({"version": 2, "commits": v1["commits"]}),
    )
    t.extend(spark.createDataFrame(_frame(10, 2)))
    assert t.versions() == [1, 2, 3]
    assert t.get_full_df().count() == 4
    assert len(os.listdir(os.path.join(root, "_pqrs_data"))) == 2


def test_compact_collapses_manifest_commits(spark, tmp_root):
    """compact() in manifest mode publishes one commit holding the whole
    table — the knob that bounds the per-commit scan-union in
    _manifest_df after many small appends."""
    t = _repo(spark, f"{tmp_root}/t")
    for i in range(4):
        t.extend(spark.createDataFrame(_frame(6 * i)))
    mf = load_manifest(t._fs(), t.main_path)
    assert len(mf["commits"]) == 4
    t.compact()
    mf2 = load_manifest(t._fs(), t.main_path)
    assert len(mf2["commits"]) == 1
    assert rows(t.get_full_df()) == rows(spark.createDataFrame(_frame(0, 24)))


def test_manifest_schema_widening_reads_back(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t", allow_schema_extension=True)
    t.extend(spark.createDataFrame(_frame(0, 3)))
    wide = pd.DataFrame(
        {"k": ["w1"], "A": [7], "C": ["0"], "B": [1.5]}
    )
    t.extend(spark.createDataFrame(wide))
    got = t.get_full_df()
    assert "B" in got.columns
    vals = {r["k"]: r["B"] for r in got.collect()}
    assert vals["w1"] == 1.5 and vals["k0"] is None


def test_extend_fenced_is_idempotent(spark, tmp_root):
    """A replayed (same-fence) append must be a no-op — the exactly-once
    contract for foreachBatch sinks. The fast path skips even the write
    job, so no orphan data dir appears for the replay."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend_fenced(spark.createDataFrame(_frame(0)), fence=("s1", 0))
    n_dirs = len(os.listdir(os.path.join(t.main_path, "_pqrs_data")))
    t.extend_fenced(spark.createDataFrame(_frame(0)), fence=("s1", 0))  # replay
    assert rows(t.get_full_df()) == rows(spark.createDataFrame(_frame(0)))
    assert len(os.listdir(os.path.join(t.main_path, "_pqrs_data"))) == n_dirs
    t.extend_fenced(spark.createDataFrame(_frame(6)), fence=("s1", 1))  # next epoch
    assert rows(t.get_full_df()) == rows(spark.createDataFrame(_frame(0, 12)))


def test_extend_fenced_requires_manifest_mode(spark, tmp_root):
    t = TableRepo(f"{tmp_root}/t2", group_cols="C", index_cols="k", spark=spark)
    with pytest.raises(TypeError):
        t.extend_fenced(spark.createDataFrame(_frame(0)), fence=("s1", 0))


def test_stream_into_repo_exactly_once(spark, tmp_root):
    """End-to-end: a file stream sunk with exactly_once=True lands every
    row exactly once, and each committed epoch carries its fence."""
    from parquetranger_spark.streaming.ingest import stream_into_repo

    src = f"{tmp_root}/src"
    spark.createDataFrame(_frame(0, 12)).repartition(2).write.parquet(src)
    t = _repo(spark, f"{tmp_root}/t3")
    stream = spark.readStream.schema("k string, A long, C string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream_into_repo(stream, t, checkpoint=f"{tmp_root}/ckpt", exactly_once=True)
    q.awaitTermination(300)
    assert rows(t.get_full_df()) == rows(spark.createDataFrame(_frame(0, 12)))
    mf = load_manifest(t._fs(), t.main_path)
    assert all("fence" in c for c in mf["commits"])


def test_restore_rolls_back_without_data_copy(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t4")
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    v = t.versions()[-1]
    t.restore(1)
    assert rows(t.get_full_df()) == rows(spark.createDataFrame(_frame(0)))
    # history is linear: restore published a NEW version
    assert t.versions()[-1] == v + 1
    # the rolled-back state is still reachable via time travel
    assert rows(t.get_full_df(version=v)) == rows(spark.createDataFrame(_frame(0, 12)))


def test_manifest_mode_honors_compression(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/tz", compression="zstd")
    t.extend(spark.createDataFrame(_frame(0)))
    mf = load_manifest(t._fs(), t.main_path)
    files = [f for c in mf["commits"] for f in c["files"]]
    assert files and all(f.endswith(".zstd.parquet") for f in files)
    assert rows(t.get_full_df()) == rows(spark.createDataFrame(_frame(0)))


def test_partition_evolution_lazy_reads_and_guards(spark, tmp_root):
    """Lazy partition evolution: old commits stay under the old spec and
    remain readable; new appends land under the new spec; mixed specs
    refuse partition-targeted writes until a rewrite unifies them."""
    t = _repo(spark, f"{tmp_root}/ev")  # grouped by C
    t.extend(spark.createDataFrame(_frame(0)))
    t.evolve_partitioning("k")  # future commits partition by k
    t.extend(spark.createDataFrame(_frame(6)))
    # full read unions both specs
    assert rows(t.get_full_df()) == rows(spark.createDataFrame(_frame(0, 12)))
    # new-spec dir layout really is k=...
    mf = load_manifest(t._fs(), t.main_path)
    specs = {tuple(c["spec"]) for c in mf["commits"]}
    assert specs == {("C",), ("k",)}
    assert any(f.startswith("k=") for c in mf["commits"] for f in c["files"] if tuple(c["spec"]) == ("k",))
    # partition-targeted writes are refused while mixed
    with pytest.raises(RuntimeError, match="partition spec"):
        t.replace_groups(spark.createDataFrame(_frame(0, 2)))
    # a reopened instance picks the evolved spec up from the manifest
    t2 = _repo(spark, f"{tmp_root}/ev")
    assert t2.group_cols == ["k"]
    # eager rewrite unifies the layout; targeted writes flow again
    t.evolve_partitioning("k", rewrite=True)
    t.replace_groups(
        spark.createDataFrame(pd.DataFrame({"k": ["k0"], "A": [99], "C": ["0"]}))
    )
    got = {r["k"]: r["A"] for r in t.get_full_df().collect()}
    assert got["k0"] == 99 and len(got) == 12


def test_fence_survives_full_prune(spark, tmp_root):
    """A fenced commit whose files are all pruned by a partition overwrite
    must survive as an empty tombstone — otherwise a crashed stream
    replaying that epoch would re-append deliberately-removed rows."""
    t = _repo(spark, f"{tmp_root}/fp")
    one_part = pd.DataFrame({"k": ["a1", "a2"], "A": [1, 2], "C": ["0", "0"]})
    t.extend_fenced(spark.createDataFrame(one_part), fence=("s1", 0))
    # overwrite partition C=0 → the fenced commit's only files are pruned
    t.replace_groups(
        spark.createDataFrame(pd.DataFrame({"k": ["b1"], "A": [9], "C": ["0"]}))
    )
    mf = load_manifest(t._fs(), t.main_path)
    fences = [c.get("fence") for c in mf["commits"] if "fence" in c]
    assert ["s1", "0"] in fences
    # the replay is still a no-op
    t.extend_fenced(spark.createDataFrame(one_part), fence=("s1", 0))
    assert {r["k"] for r in t.get_full_df().collect()} == {"b1"}


def test_stale_append_does_not_revert_evolution(spark, tmp_root):
    """An append from an instance opened BEFORE an evolution must not
    stamp its stale spec over the manifest's authoritative one."""
    t = _repo(spark, f"{tmp_root}/sa")
    t.extend(spark.createDataFrame(_frame(0)))
    stale = _repo(spark, f"{tmp_root}/sa")  # opened under spec ["C"]
    t.evolve_partitioning("k")
    stale.extend(spark.createDataFrame(_frame(6)))  # writes under ["C"]
    mf = load_manifest(t._fs(), t.main_path)
    assert mf["spec"] == ["k"]  # evolution not reverted
    # the stale commit honestly records its own layout
    assert any(c.get("spec") == ["C"] for c in mf["commits"])
    assert rows(t.get_full_df()) == rows(spark.createDataFrame(_frame(0, 12)))


def test_history_audit_log(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/hist")
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    t.replace_groups(spark.createDataFrame(pd.DataFrame(
        {"k": ["x"], "A": [1], "C": ["0"]})))
    t.restore(1)
    ops = [h["op"] for h in t.history()]
    assert ops == ["append", "append", "overwrite-dynamic", "restore(1)"]
    assert all(h["spec"] == ["C"] for h in t.history())
    assert t.history()[-1]["n_files"] == t.history()[0]["n_files"]


def test_fence_survives_static_overwrite(spark, tmp_root):
    """replace_all (static truncate-and-load) must keep fence tombstones:
    a replayed epoch after a reload must stay a no-op."""
    t = _repo(spark, f"{tmp_root}/fso")
    batch = pd.DataFrame({"k": ["a1"], "A": [1], "C": ["0"]})
    t.extend_fenced(spark.createDataFrame(batch), fence=("s1", 7))
    t.replace_all(spark.createDataFrame(pd.DataFrame(
        {"k": ["fresh"], "A": [9], "C": ["1"]})))
    t.extend_fenced(spark.createDataFrame(batch), fence=("s1", 7))  # replay
    assert {r["k"] for r in t.get_full_df().collect()} == {"fresh"}


def test_shallow_clone_zero_copy(spark, tmp_root):
    """clone_to: instant logical copy referencing the source's data dirs;
    snapshot-isolated both ways; independently writable; clone vacuum
    never touches borrowed dirs."""
    src = _repo(spark, f"{tmp_root}/src")
    src.extend(spark.createDataFrame(_frame(0)))
    clone = src.clone_to(f"{tmp_root}/clone")
    assert rows(clone.get_full_df()) == rows(spark.createDataFrame(_frame(0)))
    # zero data under the clone root
    assert not os.path.exists(os.path.join(clone.main_path, "_pqrs_data")) or not os.listdir(
        os.path.join(clone.main_path, "_pqrs_data")
    )
    # source evolves → clone frozen at its snapshot
    src.extend(spark.createDataFrame(_frame(6)))
    assert rows(clone.get_full_df()) == rows(spark.createDataFrame(_frame(0)))
    # clone writable independently; source unaffected
    clone.extend(spark.createDataFrame(_frame(12)))
    assert rows(clone.get_full_df()) == rows(spark.createDataFrame(_frame(0)).unionByName(
        spark.createDataFrame(_frame(12))))
    assert rows(src.get_full_df()) == rows(spark.createDataFrame(_frame(0, 12)))
    ops = [h["op"] for h in clone.history()]
    assert ops[0].startswith("clone(")
    # clone vacuum leaves the source's (borrowed) data intact
    clone.vacuum(max_age_seconds=-1)
    assert rows(clone.get_full_df()) == rows(
        spark.createDataFrame(_frame(0)).unionByName(spark.createDataFrame(_frame(12)))
    )


def test_stats_skipping_prunes_files_and_stays_exact(spark, tmp_root):
    """File-level [min,max] stats recorded at commit time prune files
    driver-side on read; results equal the unpruned filtered scan."""
    t = TableRepo(
        f"{tmp_root}/sk",
        index_cols="k",
        commit_mode="manifest",
        stats_cols=["A", "tag"],
        spark=spark,
    )
    # three range-disjoint commits (A: 0-5, 100-105, 200-205)
    for lo, tag in [(0, "cold"), (100, "warm"), (200, "hot")]:
        pdf = pd.DataFrame(
            {"k": [f"k{lo+i}" for i in range(6)], "A": range(lo, lo + 6), "tag": tag}
        )
        t.extend(spark.createDataFrame(pdf))
    mf = load_manifest(t._fs(), t.main_path)
    assert all(c.get("stats") for c in mf["commits"]), "stats missing from manifest"
    # numeric range hits only the middle commit
    kept, total = t.skip_plan([("A", "between", 101, 104)])
    assert kept < total and kept >= 1
    got = sorted(r["A"] for r in t.get_full_df_skipping([("A", "between", 101, 104)]).collect())
    assert got == [101, 102, 103, 104]
    # string equality skips the other tags' files
    kept_s, total_s = t.skip_plan([("tag", "==", "hot")])
    assert kept_s < total_s
    got_s = sorted(r["A"] for r in t.get_full_df_skipping([("tag", "==", "hot")]).collect())
    assert got_s == list(range(200, 206))
    # comparison ops
    assert sorted(
        r["A"] for r in t.get_full_df_skipping([("A", ">=", 204)]).collect()
    ) == [204, 205]
    kept_none, _ = t.skip_plan([("A", ">", 1000)])
    assert kept_none == 0
    assert t.get_full_df_skipping([("A", ">", 1000)]).count() == 0


def test_stats_skipping_conservative_without_stats(spark, tmp_root):
    """Commits written before stats_cols was configured (or columns with
    no recorded stats) are never skipped — exactness beats pruning."""
    t0 = TableRepo(f"{tmp_root}/cs", index_cols="k", commit_mode="manifest", spark=spark)
    t0.extend(spark.createDataFrame(pd.DataFrame({"k": ["a"], "A": [1]})))
    t = TableRepo(
        f"{tmp_root}/cs",
        index_cols="k",
        commit_mode="manifest",
        stats_cols="A",
        spark=spark,
    )
    t.extend(spark.createDataFrame(pd.DataFrame({"k": ["b"], "A": [500]})))
    # predicate excludes the stats-bearing commit; the stats-less one stays
    kept, total = t.skip_plan([("A", "<=", 10)])
    assert (kept, total) == (1, 2)
    assert [r["A"] for r in t.get_full_df_skipping([("A", "<=", 10)]).collect()] == [1]


def test_stats_skipping_all_null_and_files_mode_guard(spark, tmp_root):
    import pyspark.sql.types as T

    with pytest.raises(ValueError, match="stats_cols requires"):
        TableRepo(f"{tmp_root}/g", stats_cols="A", spark=spark)
    t = TableRepo(
        f"{tmp_root}/nu",
        index_cols="k",
        commit_mode="manifest",
        stats_cols="A",
        spark=spark,
    )
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("A", T.LongType())]
    )
    t.extend(spark.createDataFrame([("a", None), ("b", None)], schema))
    t.extend(spark.createDataFrame([("c", 7)], schema))
    # the all-null commit (and any zero-row part files) is provably
    # excluded by any comparison
    kept, total = t.skip_plan([("A", ">=", 0)])
    assert kept == 1 and total >= 2
    assert [r["k"] for r in t.get_full_df_skipping([("A", ">=", 0)]).collect()] == ["c"]


def test_cluster_by_makes_stats_skipping_selective(spark, tmp_root):
    """Write clustering composes with manifest stats: cluster_by sorts
    rows so each file covers a tight key range, and a range predicate
    then skips most files of even a SINGLE commit — the
    OPTIMIZE-then-skip pattern. The same data unclustered produces
    overlapping per-file ranges that cannot be pruned."""
    import random

    rng = random.Random(7)
    vals = list(range(4000))
    rng.shuffle(vals)
    pdf = pd.DataFrame({"k": [f"k{v}" for v in vals], "A": vals})

    def build(root, **kw):
        t = TableRepo(
            root,
            index_cols="k",
            commit_mode="manifest",
            stats_cols="A",
            max_records=500,
            spark=spark,
            **kw,
        )
        t.extend(spark.createDataFrame(pdf).coalesce(1))
        return t

    clustered = build(f"{tmp_root}/cl", cluster_by="A")
    plain = build(f"{tmp_root}/pl")
    pred = [("A", "between", 100, 299)]
    kept_c, total_c = clustered.skip_plan(pred)
    kept_p, total_p = plain.skip_plan(pred)
    assert total_c >= 8  # maxRecordsPerFile actually split the commit
    assert kept_c <= 2, f"clustered files should be range-tight ({kept_c}/{total_c})"
    assert kept_p == total_p, "unclustered shuffled data cannot be pruned"
    got = sorted(r["A"] for r in clustered.get_full_df_skipping(pred).collect())
    assert got == list(range(100, 300))


def test_stats_skipping_in_op_and_nan_conservative(spark, tmp_root):
    """'in' predicates prune by interval overlap; NaN stats bounds
    disable skipping for that file (Spark lets NaN satisfy ordering
    predicates, so interval logic is unsound there)."""
    t = TableRepo(
        f"{tmp_root}/io",
        index_cols="k",
        commit_mode="manifest",
        stats_cols=["A", "v"],
        spark=spark,
    )
    t.extend(
        spark.createDataFrame(
            pd.DataFrame({"k": ["a", "b"], "A": [1, 2], "v": [1.0, 2.0]})
        ).coalesce(1)
    )
    # tuple path, not pandas: pandas NaN converts to NULL on the way in,
    # which is a different (correctly skippable) case — this row carries
    # a genuine double NaN
    t.extend(
        spark.createDataFrame(
            [("c", 50, float("nan"))], "k string, A bigint, v double"
        )
    )
    kept, total = t.skip_plan([("A", "in", [2, 3])])
    assert kept == 1 and total >= 2  # only the [1,2] file overlaps {2,3}
    got = sorted(r["k"] for r in t.get_full_df_skipping([("A", "in", [2, 50])]).collect())
    assert got == ["b", "c"]
    # NaN max bound: the file must survive an ordering predicate
    kept_nan, _ = t.skip_plan([("v", ">=", 100.0)])
    assert kept_nan == 1  # only the NaN file — Spark NaN >= 100.0 is true
    assert [r["k"] for r in t.get_full_df_skipping([("v", ">=", 100.0)]).collect()] == ["c"]
    with pytest.raises(ValueError, match="empty 'in'"):
        t.skip_plan([("A", "in", [])])


def test_stream_manifest_versions_as_offsets(spark, tmp_root, tmp_path):
    """Manifest-log streaming source: offsets are manifest versions, a
    resumed checkpoint streams ONLY commits made since (exactly-once, no
    re-reads), partition columns are reconstructed from hive dirs, and
    an overwrite surfaces only its newly-written rows (ignoreChanges
    contract, no retraction)."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ckpt"

    def run():
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

    run()
    assert rows(spark.read.parquet(out)) == rows(spark.createDataFrame(_frame(0, 12)))
    t.extend(spark.createDataFrame(_frame(12)))
    run()
    got = rows(spark.read.parquet(out))
    assert got == rows(spark.createDataFrame(_frame(0, 18)))  # no duplicates
    upd = pd.DataFrame({"k": ["x"], "A": [99], "C": ["1"]})
    t.replace_groups(spark.createDataFrame(upd))
    run()
    got2 = rows(spark.read.parquet(out))
    assert ("x", 99, "1") in got2 and len(got2) == 19
    # files mode refuses; manifest mode refuses the listing-based stream
    with pytest.raises(TypeError, match="stream_manifest"):
        TableRepo(f"{tmp_root}/fm", index_cols="k", spark=spark).stream_manifest()
    with pytest.raises(TypeError, match="stream_manifest"):
        t.stream(1)


def test_changes_between_versions(spark, tmp_root):
    """Batch change feed: inserts for added files, deletes for removed
    ones, derived purely from the two manifests — an upsert shows the
    rewritten partition's old rows as deletes and new rows as inserts,
    and replaying deletes-then-inserts converges a downstream copy."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0, 9)))      # v1: C 0/1/2 × 3
    t.extend(spark.createDataFrame(_frame(9, 3)))      # v2: one row per C
    upd = pd.DataFrame({"k": ["x1"], "A": [100], "C": ["1"]})
    t.replace_groups(spark.createDataFrame(upd))       # v3: rewrites C=1

    ch12 = t.changes_between(1, 2)
    assert sorted(
        (r["k"], r["_change_type"]) for r in ch12.collect()
    ) == sorted((f"k{i}", "insert") for i in range(9, 12))

    ch23 = {(r["k"], r["_change_type"]) for r in t.changes_between(2, 3).collect()}
    # C=1 rows at v2: k1, k4, k7, k10 deleted; x1 inserted
    assert ch23 == {("k1", "delete"), ("k4", "delete"), ("k7", "delete"),
                    ("k10", "delete"), ("x1", "insert")}
    # full-feed replay from empty converges to the current table
    feed = t.changes_between(0)
    ins = {r["k"] for r in feed.where("_change_type = 'insert'").collect()}
    assert ins == {r["k"] for r in t.get_full_df().collect()}
    assert feed.where("_change_type = 'delete'").count() == 0
    # identical versions → empty feed with the schema intact
    same = t.changes_between(3, 3)
    assert same.count() == 0 and "_change_type" in same.columns
    with pytest.raises(TypeError, match="changes_between"):
        TableRepo(f"{tmp_root}/fm", index_cols="k", spark=spark).changes_between(0)


def test_stats_on_partition_column_and_api_guards(spark, tmp_root):
    """Stats on a HIVE PARTITION column use the sidecar types (string
    '1' dirs must not be inferred as ints), and the API guards hold:
    transposed changes_between raises, a missing explicit version raises
    KeyError from skip_plan too, and null/NaN predicate values are
    rejected up front."""
    t = _repo(spark, f"{tmp_root}/t", stats_cols=["C", "A"])
    t.extend(spark.createDataFrame(_frame(0, 9)))  # C in '0','1','2'
    kept, total = t.skip_plan([("C", "==", "1")])
    assert kept < total
    got = sorted(r["k"] for r in t.get_full_df_skipping([("C", "==", "1")]).collect())
    assert got == ["k1", "k4", "k7"]
    with pytest.raises(ValueError, match="start"):
        t.changes_between(2, 1)
    with pytest.raises(KeyError, match="99"):
        t.skip_plan([("A", ">=", 0)], version=99)
    with pytest.raises(ValueError, match="non-null"):
        t.skip_plan([("A", "==", None)])
    with pytest.raises(ValueError, match="NaN"):
        t.skip_plan([("A", "in", [1.0, float("nan")])])


def test_stream_manifest_unescapes_partition_values(spark, tmp_root, tmp_path):
    """Partition values Spark %xx-escapes in dir names (':' → %3A) come
    back unescaped from the streaming source, matching the batch read."""
    t = _repo(spark, f"{tmp_root}/t")
    pdf = pd.DataFrame({"k": ["a", "b"], "A": [1, 2], "C": ["x:1", "y 2"]})
    t.extend(spark.createDataFrame(pdf))
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
    assert rows(spark.read.parquet(out)) == rows(t.get_full_df())
    assert {r["C"] for r in spark.read.parquet(out).collect()} == {"x:1", "y 2"}


def test_stream_manifest_partitioned_matches_simple(spark, tmp_root, tmp_path):
    """The executor-side (partitioned) stream flavor produces exactly
    the simple reader's rows — one task per added file, Arrow batches,
    partition columns reconstructed and typed, incremental resume
    exactly-once."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ckpt"

    def run():
        q = (
            t.stream_manifest(partitioned=True)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()
    assert rows(spark.read.parquet(out)) == rows(spark.createDataFrame(_frame(0, 12)))
    t.extend(spark.createDataFrame(_frame(12)))
    run()
    assert rows(spark.read.parquet(out)) == rows(spark.createDataFrame(_frame(0, 18)))


def test_stream_manifest_stats_pruned_subscription(spark, tmp_root, tmp_path):
    """predicates= turns the stream into a stats-pruned subscription:
    commits whose files provably cannot match never enter a micro-batch
    (file-level — a surviving file streams whole), in both reader
    flavors."""
    t = TableRepo(
        f"{tmp_root}/sub",
        index_cols="k",
        commit_mode="manifest",
        stats_cols="A",
        spark=spark,
    )
    # two range-disjoint commits
    t.extend(spark.createDataFrame(pd.DataFrame({"k": ["a", "b"], "A": [1, 2]})).coalesce(1))
    t.extend(spark.createDataFrame(pd.DataFrame({"k": ["c", "d"], "A": [100, 101]})).coalesce(1))
    for flavor, partitioned in [("simple", False), ("px", True)]:
        out, ckpt = f"{tmp_path}/out_{flavor}", f"{tmp_path}/ckpt_{flavor}"
        q = (
            t.stream_manifest(partitioned=partitioned, predicates=[("A", ">=", 50)])
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = sorted(r["k"] for r in spark.read.parquet(out).collect())
        # the low-range commit's file was pruned at the SOURCE: its rows
        # never streamed even though no row filter ran
        assert got == ["c", "d"], flavor


def test_manifest_to_manifest_exactly_once_replication(spark, tmp_root, tmp_path):
    """The full loop: manifest-log SOURCE (versions as offsets) feeding a
    FENCED manifest sink — end-to-end exactly-once replication between
    two repos. Incremental runs ship only new commits; a re-run with no
    new source commits changes nothing; row sets match after every
    step."""
    from parquetranger_spark.streaming.ingest import stream_into_repo

    src = _repo(spark, f"{tmp_root}/src")
    dst = _repo(spark, f"{tmp_root}/dst")
    ckpt = f"{tmp_path}/ckpt"

    def replicate():
        q = stream_into_repo(
            src.stream_manifest(), dst, checkpoint=ckpt, exactly_once=True
        )
        q.awaitTermination(300)

    src.extend(spark.createDataFrame(_frame(0)))
    src.extend(spark.createDataFrame(_frame(6)))
    replicate()
    assert rows(dst.get_full_df()) == rows(src.get_full_df())
    # incremental: only the new commit ships
    src.extend(spark.createDataFrame(_frame(12)))
    replicate()
    assert rows(dst.get_full_df()) == rows(src.get_full_df())
    # idempotent: nothing new → nothing appended, no duplicate rows
    v_before = dst.versions()[-1]
    replicate()
    assert dst.versions()[-1] == v_before
    assert rows(dst.get_full_df()) == rows(src.get_full_df())


def test_bloom_index_prunes_point_lookups(spark, tmp_root):
    """Per-file Bloom filters prune == / in lookups on an UNCLUSTERED
    column where [min,max] ranges cannot (every file spans the full key
    range); results stay exact, absent keys prune everything, and range
    predicates are untouched by blooms."""
    import random

    rng = random.Random(3)
    keys = [f"user{i:04d}" for i in range(400)]
    rng.shuffle(keys)
    t = TableRepo(
        f"{tmp_root}/bl",
        index_cols="k",
        commit_mode="manifest",
        stats_cols="A",
        bloom_cols="k",
        max_records=100,
        spark=spark,
    )
    pdf = pd.DataFrame({"k": keys, "A": range(400)})
    t.extend(spark.createDataFrame(pdf).coalesce(1))  # one commit, 4 files
    mf = load_manifest(t._fs(), t.main_path)
    assert any(c.get("blooms") for c in mf["commits"])
    # keys are shuffled, so every file's k-range overlaps: without blooms
    # a point lookup keeps all files
    target = keys[0]
    kept, total = t.skip_plan([("k", "==", target)])
    assert total >= 4 and kept < total
    got = [r["A"] for r in t.get_full_df_skipping([("k", "==", target)]).collect()]
    assert got == [pdf.index[pdf["k"] == target][0]]
    # absent key: every file provably excluded
    kept_absent, _ = t.skip_plan([("k", "==", "nope")])
    assert kept_absent == 0
    assert t.get_full_df_skipping([("k", "==", "nope")]).count() == 0
    # 'in' keeps the union of files holding either key
    k2 = keys[333]
    got_in = sorted(
        r["k"] for r in t.get_full_df_skipping([("k", "in", [target, k2])]).collect()
    )
    assert got_in == sorted([target, k2])
    # blooms never affect range predicates
    kept_rng, total_rng = t.skip_plan([("A", "between", 0, 399)])
    assert kept_rng == total_rng


def test_bloom_pruned_stream_subscription(spark, tmp_root, tmp_path):
    """Point-predicate subscriptions consult blooms too: a stream
    subscribed to one key receives only files whose bitmap may contain
    it — needle subscriptions on unclustered keys."""
    t = TableRepo(
        f"{tmp_root}/bs",
        index_cols="k",
        commit_mode="manifest",
        bloom_cols="k",
        spark=spark,
    )
    t.extend(spark.createDataFrame(pd.DataFrame({"k": ["a1", "a2"], "A": [1, 2]})).coalesce(1))
    t.extend(spark.createDataFrame(pd.DataFrame({"k": ["b1", "b2"], "A": [3, 4]})).coalesce(1))
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ckpt"
    q = (
        t.stream_manifest(predicates=[("k", "==", "b2")])
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # first commit's file pruned by its bloom; second streams whole
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == ["b1", "b2"]


def test_compact_backfills_stats_and_blooms(spark, tmp_root):
    """compact() rewrites the table under the CURRENT repo config, so
    configuring stats/bloom columns on an existing table and compacting
    is the index backfill — afterwards skipping prunes where the
    original commits had nothing to prune on."""
    plain = TableRepo(f"{tmp_root}/bf", index_cols="k", commit_mode="manifest", spark=spark)
    for lo in (0, 100):
        plain.extend(
            spark.createDataFrame(
                pd.DataFrame({"k": [f"k{lo+i}" for i in range(4)], "A": range(lo, lo + 4)})
            ).coalesce(1)
        )
    indexed = TableRepo(
        f"{tmp_root}/bf",
        index_cols="k",
        commit_mode="manifest",
        stats_cols="A",
        bloom_cols="k",
        max_records=4,
        spark=spark,
    )
    kept0, total0 = indexed.skip_plan([("A", "<=", 3)])
    assert kept0 == total0  # nothing recorded yet — conservatively all kept
    indexed.compact()
    kept, total = indexed.skip_plan([("A", "<=", 3)])
    assert total >= 2 and kept < total
    got = sorted(r["A"] for r in indexed.get_full_df_skipping([("A", "<=", 3)]).collect())
    assert got == [0, 1, 2, 3]
    kept_b, total_b = indexed.skip_plan([("k", "==", "k101")])
    assert kept_b < total_b


def test_index_survives_deletion_and_index_stats(spark, tmp_root):
    """Keyed deletion rewrites touched partitions through the normal
    write path, so the NEW commit re-records stats and blooms — skipping
    stays sound and selective after deletes; index_stats() exposes the
    per-file index from the manifest alone."""
    t = TableRepo(
        f"{tmp_root}/ix",
        group_cols="C",
        index_cols="k",
        commit_mode="manifest",
        stats_cols="A",
        bloom_cols="k",
        spark=spark,
    )
    t.extend(spark.createDataFrame(_frame(0, 12)))
    t.delete_records(spark.createDataFrame(pd.DataFrame({"k": ["k3", "k4"]})))
    # exactness post-delete under skipping
    got = sorted(r["k"] for r in t.get_full_df_skipping([("A", "<=", 5)]).collect())
    assert got == ["k0", "k1", "k2", "k5"]
    # the rewritten partitions' files carry fresh stats + blooms
    ix = t.index_stats().collect()
    assert ix and all(r["column"] in ("A", "k") for r in ix)
    a_rows = [r for r in ix if r["column"] == "A"]
    k_rows = [r for r in ix if r["column"] == "k"]
    assert a_rows and all(r["min_value"] is not None for r in a_rows)
    assert k_rows and all(r["has_bloom"] for r in k_rows)
    # deleted keys are bloom-pruned wherever their old files died
    kept, total = t.skip_plan([("k", "==", "k3")])
    got3 = t.get_full_df_skipping([("k", "==", "k3")]).count()
    assert got3 == 0
    with pytest.raises(TypeError, match="index_stats"):
        TableRepo(f"{tmp_root}/fm2", index_cols="k", spark=spark).index_stats()


def test_stream_resume_after_vacuumed_offset_fails_loudly(spark, tmp_root, tmp_path):
    """Vacuuming the manifest a live stream's checkpoint offset points at
    must fail the resumed stream with the documented retention error —
    never silently re-read the world (the Delta vacuum-vs-streaming
    caveat, enforced)."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ckpt"

    def run():
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

    run()  # checkpoint now at v2
    t.replace_all(spark.createDataFrame(_frame(20, 3)))  # v3 supersedes all
    data_root = os.path.join(f"{tmp_root}/t", "_pqrs_data")
    past = time.time() - 7200
    for name in os.listdir(data_root):
        os.utime(os.path.join(data_root, name), (past, past))
    t.vacuum(max_age_seconds=3600)  # sweeps manifests v1/v2
    assert t.versions() == [3]
    with pytest.raises(Exception, match="vacuumed|retained"):
        run()


def test_vacuum_keep_versions_preserves_stream_resume(spark, tmp_root, tmp_path):
    """keep_versions retains the newest N manifests AND their data dirs,
    so a stream whose checkpoint lags inside the window resumes cleanly
    after a vacuum — the tunable answer to the retention caveat."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ckpt"

    def run():
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

    run()  # checkpoint at v2
    t.extend(spark.createDataFrame(_frame(12)))  # v3
    data_root = os.path.join(f"{tmp_root}/t", "_pqrs_data")
    past = time.time() - 7200
    for name in os.listdir(data_root):
        os.utime(os.path.join(data_root, name), (past, past))
    t.vacuum(max_age_seconds=3600, keep_versions=2)  # keeps v2 AND v3
    assert t.versions() == [2, 3]
    run()  # resumes from v2 across the vacuum
    assert rows(spark.read.parquet(out)) == rows(spark.createDataFrame(_frame(0, 18)))
    # time travel within the retained window still works
    assert t.get_full_df(version=2).count() == 12
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep_versions"):
        t.vacuum(keep_versions=0)


def test_stats_clone_dfs_and_boolean_partition_delete(spark, tmp_root):
    """Three regressions in one lifecycle: stats() works on a MULTI-commit
    manifest table (_metadata does not survive Union — must be selected
    per scan); a shallow clone's per-file readers anchor basePath under
    the SOURCE root; boolean partition values render as Spark's lowercase
    hive encoding so emptying deletes actually remove the rows."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    st = {r["C"]: r["n_rows"] for r in t.stats().collect()}
    assert sum(st.values()) == 12 and set(st) == {"0", "1", "2"}
    # clone: dfs / read_df_from_path resolve against the source's data dirs
    c = t.clone_to(f"{tmp_root}/c")
    first = next(iter(c.dfs))
    assert "C" in first.columns and first.count() > 0
    assert c.read_df_from_path(c.paths[0]).count() > 0
    # a refused clone must not clobber the existing target's sidecar
    import pytest as _pytest

    from parquetranger_spark.plans.schema import load_meta

    before = load_meta(c.main_path, spark=spark).schema
    with _pytest.raises(RuntimeError, match="already has a manifest"):
        t.clone_to(f"{tmp_root}/c")
    assert load_meta(c.main_path, spark=spark).schema == before
    # boolean partition column: delete-to-empty must hit 'flag=true'
    b = TableRepo(
        f"{tmp_root}/b", group_cols="flag", index_cols="k", commit_mode="manifest", spark=spark
    )
    b.extend(
        spark.createDataFrame(
            [("a", True), ("b", False)], "k string, flag boolean"
        )
    )
    b.delete_records(spark.createDataFrame([("a",)], "k string"))
    assert [r["k"] for r in b.get_full_df().collect()] == ["b"]
    fb = TableRepo(f"{tmp_root}/fb", group_cols="flag", index_cols="k", spark=spark)
    fb.extend(
        spark.createDataFrame([("a", True), ("b", False)], "k string, flag boolean")
    )
    fb.delete_records(spark.createDataFrame([("a",)], "k string"))
    assert [r["k"] for r in fb.get_full_df().collect()] == ["b"]


def test_wap_stage_audit_publish(spark, tmp_root):
    """Write-audit-publish: a staged batch is invisible until publish,
    auditable from exactly the files that would land, and abortable
    without a trace."""
    t = _repo(spark, f"{tmp_root}/wap")
    t.extend(spark.createDataFrame(_frame(0)))
    v0 = t.versions()[-1]

    # stage a bad batch, audit it, abort: nothing changes
    bad = t.stage_extend(spark.createDataFrame(_frame(100)))
    assert bad.dataframe().count() == 6      # audit reads the staged files
    assert t.get_full_df().count() == 6      # readers see only v0 data
    assert t.versions()[-1] == v0
    bad.abort()
    assert t.get_full_df().count() == 6
    # the staged dir is gone — no stranded data for vacuum to chase
    from parquetranger_spark.sources.manifest import DATA_DIR
    live = {c["dir"] for c in load_manifest(t._fs(), t.main_path)["commits"]}
    on_disk = {
        f"{DATA_DIR}/{d}" for d in os.listdir(os.path.join(t.main_path, DATA_DIR))
    }
    assert on_disk == live

    # stage a good batch and publish: one new version, rows appended
    good = t.stage_extend(spark.createDataFrame(_frame(10)))
    assert t.get_full_df().count() == 6
    good.publish()
    assert t.get_full_df().count() == 12
    assert t.versions()[-1] == v0 + 1

    # a consumed handle refuses every op
    with pytest.raises(RuntimeError):
        good.publish()
    with pytest.raises(RuntimeError):
        good.abort()
    with pytest.raises(RuntimeError):
        good.dataframe()


def test_wap_publish_replace_groups(spark, tmp_root):
    """publish(mode='replace_groups') dynamically overwrites exactly the
    staged partitions, like replace_groups."""
    t = _repo(spark, f"{tmp_root}/wap_rg")
    t.extend(spark.createDataFrame(_frame(0)))
    before = rows(t.get_full_df())
    # stage rows for group C='0' only (k90: 90%3=0)
    batch = pd.DataFrame({"k": ["z1", "z2"], "A": [900, 901], "C": ["0", "0"]})
    st = t.stage_extend(spark.createDataFrame(batch))
    st.publish(mode="replace_groups")
    after = rows(t.get_full_df())
    kept = [r for r in before if r[2] != "0"]
    assert after == sorted(kept + [("z1", 900, "0"), ("z2", 901, "0")])


def test_wap_requires_manifest_mode(spark, tmp_root):
    t = TableRepo(f"{tmp_root}/wap_files", group_cols="C", spark=spark)
    with pytest.raises(TypeError):
        t.stage_extend(spark.createDataFrame(_frame(0)))


def _dv_kinds(t):
    return [c.get("kind") for c in load_manifest(t._fs(), t.main_path)["commits"]]


def test_dv_delete_hides_rows_without_rewrite(spark, tmp_root):
    """Merge-on-read delete: rows vanish from every read surface but no
    data file is touched — the tombstone commit is the only change."""
    t = _repo(spark, f"{tmp_root}/dv")
    t.extend(spark.createDataFrame(_frame(0)))
    files_before = set(t.paths)
    t.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["k1", "k4"]})))
    assert set(t.paths) == files_before          # zero data files rewritten
    assert "dv" in _dv_kinds(t)
    got = rows(t.get_full_df())
    assert [r[0] for r in got] == ["k0", "k2", "k3", "k5"]
    # partition-pruned read applies the DV too
    part = t.get_partition_df("1")               # k1: 1%3=1, k4: 4%3=1
    assert part.count() == 0
    # time travel to before the delete still sees everything
    assert t.get_full_df(version=t.versions()[0]).count() == 6


def test_dv_upsert_after_delete_survives(spark, tmp_root):
    """A row appended AFTER its key was tombstoned is live (the dv only
    kills rows below it in the commit list); deleting again kills it."""
    t = _repo(spark, f"{tmp_root}/dv_seq")
    t.extend(spark.createDataFrame(_frame(0)))
    key = pd.DataFrame({"k": ["k2"]})
    t.delete_records_dv(spark.createDataFrame(key))
    assert t.get_full_df().where("k = 'k2'").count() == 0
    t.extend(spark.createDataFrame(pd.DataFrame({"k": ["k2"], "A": [99], "C": ["2"]})))
    assert t.get_full_df().where("k = 'k2'").collect()[0]["A"] == 99
    t.delete_records_dv(spark.createDataFrame(key))
    assert t.get_full_df().where("k = 'k2'").count() == 0
    assert t.get_full_df().count() == 5


def test_dv_static_rewrite_materializes_and_drops_dvs(spark, tmp_root):
    """rewrite_to_canonical reads through the DVs and publishes a clean
    static overwrite: same visible rows, no dv entries left."""
    t = _repo(spark, f"{tmp_root}/dv_rw")
    t.extend(spark.createDataFrame(_frame(0)))
    t.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["k0", "k3"]})))
    before = rows(t.get_full_df())
    t.rewrite_to_canonical()
    assert rows(t.get_full_df()) == before
    assert "dv" not in _dv_kinds(t)


def test_dv_change_feed_emits_row_deletes(spark, tmp_root):
    """A dv committed in the window surfaces the actually-deleted rows as
    _change_type='delete' (file set unchanged)."""
    t = _repo(spark, f"{tmp_root}/dv_cdf")
    t.extend(spark.createDataFrame(_frame(0)))
    v1 = t.versions()[-1]
    t.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["k1", "k5"]})))
    ch = t.changes_between(v1)
    got = sorted((r["k"], r["_change_type"]) for r in ch.collect())
    assert got == [("k1", "delete"), ("k5", "delete")]
    # full-window feed nets out: inserts of surviving rows only
    ch0 = t.changes_between(0)
    assert sorted(r["k"] for r in ch0.collect() if r["_change_type"] == "insert") == [
        "k0", "k2", "k3", "k4",
    ]


def test_dv_requires_manifest_and_keys(spark, tmp_root):
    t = TableRepo(f"{tmp_root}/dv_files", group_cols="C", index_cols="k", spark=spark)
    with pytest.raises(TypeError):
        t.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["a"]})))
    t2 = TableRepo(f"{tmp_root}/dv_nokeys", commit_mode="manifest", spark=spark)
    with pytest.raises(TypeError):
        t2.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["a"]})))


def _spill_repo(spark, root):
    # manifest_inline_files_max=0: every commit spills its file list —
    # the manifest-of-manifests tier exercised at toy scale
    return TableRepo(
        root, group_cols="C", index_cols="k", commit_mode="manifest",
        manifest_inline_files_max=0, spark=spark,
    )


def test_spilled_file_lists_roundtrip(spark, tmp_root):
    """Commits above the inline threshold write their file list to an
    immutable side object; the version JSON carries only the ref, and
    every read surface resolves it transparently."""
    t = _spill_repo(spark, f"{tmp_root}/spill")
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    assert t.get_full_df().count() == 12
    assert len(t.paths) > 0                      # paths resolve through refs
    # the raw version JSON must NOT inline the file lists
    vs = t.versions()
    raw = json.loads(
        open(os.path.join(t.main_path, MANIFEST_DIR, f"v{vs[-1]:020d}.json")).read()
    )
    for c in raw["commits"]:
        assert "files" not in c and c["files_ref"].startswith("_pqrs_manifest/lists/")
    # time travel resolves refs of older versions too
    assert t.get_full_df(version=vs[0]).count() == 6
    # upsert (read-modify-write through prune) keeps working
    upd = pd.DataFrame({"k": ["k1"], "A": [999], "C": ["1"]})
    t.replace_records(spark.createDataFrame(upd))
    got = {r["k"]: r["A"] for r in t.get_full_df().collect()}
    assert got["k1"] == 999 and len(got) == 12


def test_spilled_lists_prune_drops_stale_ref(spark, tmp_root):
    """A dynamic overwrite that prunes files out of a spilled-list entry
    re-inlines that entry — serializing the stale ref would resurrect
    the pruned files."""
    t = _spill_repo(spark, f"{tmp_root}/spill_prune")
    t.extend(spark.createDataFrame(_frame(0)))       # C groups 0,1,2
    t.replace_groups(spark.createDataFrame(
        pd.DataFrame({"k": ["x"], "A": [1], "C": ["0"]})
    ))
    assert sorted(r["k"] for r in t.get_full_df().where("C = '0'").collect()) == ["x"]
    # total row set is consistent after the prune
    assert t.get_full_df().count() == 1 + sum(1 for i in range(6) if i % 3 != 0)


def test_spilled_lists_vacuum_keeps_referenced(spark, tmp_root):
    """Vacuum sweeps list objects referenced by no retained version but
    never one a retained manifest still points at."""
    t = _spill_repo(spark, f"{tmp_root}/spill_vac")
    t.extend(spark.createDataFrame(_frame(0)))
    t.replace_all(spark.createDataFrame(_frame(20)))
    lists_dir = os.path.join(t.main_path, MANIFEST_DIR, "lists")
    n_before = len(os.listdir(lists_dir))
    assert n_before >= 2
    # age out everything, retain only the newest version
    deleted = t.vacuum(max_age_seconds=-1, keep_versions=1)
    left = {n for n in os.listdir(lists_dir) if n.endswith(".json")}
    raw = json.loads(open(os.path.join(
        t.main_path, MANIFEST_DIR, f"v{t.versions()[-1]:020d}.json")).read())
    live = {c["files_ref"].rsplit("/", 1)[-1] for c in raw["commits"]}
    assert live <= left                      # referenced lists survive
    assert left == live                      # orphans are gone
    assert t.get_full_df().count() == 6      # table still reads fine
    assert any("lists" in d for d in deleted)


def test_stream_manifest_resolves_spilled_lists(spark, tmp_root, tmp_path):
    """The streaming source resolves files_ref commits like the batch
    loader — a table under the manifest-of-manifests tier streams
    identically."""
    t = _spill_repo(spark, f"{tmp_root}/spill_stream")
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
    assert rows(spark.read.parquet(out)) == rows(spark.createDataFrame(_frame(0, 12)))


def test_spilled_lists_concurrent_appends_compose(spark, tmp_root):
    """CAS retries re-serialize manifests whose entries are spilled refs:
    the loser must republish resolved entries WITHOUT re-inlining them."""
    root = f"{tmp_root}/spill_cc"
    seed = _spill_repo(spark, root)
    seed.extend(spark.createDataFrame(_frame(0, 1)))

    def worker(i):
        r = _spill_repo(spark, root)
        r.extend(spark.createDataFrame(_frame(10 * (i + 1), 5)))

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(worker, range(4)))
    t = _spill_repo(spark, root)
    assert t.get_full_df().count() == 1 + 4 * 5
    assert t.versions()[-1] == 5
    raw = json.loads(open(os.path.join(
        t.main_path, MANIFEST_DIR, f"v{5:020d}.json")).read())
    assert all("files" not in c and "files_ref" in c for c in raw["commits"])


def test_tags_pin_snapshots_against_vacuum(spark, tmp_root):
    """A tag retains its version (manifest + data dirs) through a vacuum
    that would otherwise sweep it; deleting the tag releases it."""
    t = _repo(spark, f"{tmp_root}/tags")
    t.extend(spark.createDataFrame(_frame(0)))
    t.tag("baseline")
    t.replace_all(spark.createDataFrame(_frame(20, 3)))
    t.replace_all(spark.createDataFrame(_frame(40, 2)))
    assert t.tags() == {"baseline": 1}
    # vacuum keeps only the newest version + the tagged one
    t.vacuum(max_age_seconds=-1, keep_versions=1)
    assert t.versions() == [1, 3]
    assert t.get_tagged_df("baseline").count() == 6     # pinned data intact
    assert t.get_full_df().count() == 2
    # re-tagging moves the pin; deleting releases it
    t.tag("baseline")                                    # now -> version 3
    assert t.tags()["baseline"] == 3
    t.delete_tag("baseline")
    assert t.tags() == {}
    t.vacuum(max_age_seconds=-1, keep_versions=1)
    assert t.versions() == [3]
    with pytest.raises(ValueError):
        t.tag(".hidden")
    with pytest.raises(KeyError):
        t.tag("nope", version=99)


def test_full_compact_materializes_dvs_and_drops_entries(spark, tmp_root):
    """Full-table compact clears spent deletion vectors: same visible
    rows, no dv entries, and a partition whose rows were all dv'd away
    does not resurrect."""
    t = _repo(spark, f"{tmp_root}/dv_compact")
    t.extend(spark.createDataFrame(_frame(0)))
    # kill ALL of group C='0' (k0, k3) plus one other row
    t.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["k0", "k3", "k1"]})))
    before = rows(t.get_full_df())
    t.compact()
    assert rows(t.get_full_df()) == before
    assert "dv" not in _dv_kinds(t)
    assert t.get_full_df().where("C = '0'").count() == 0


def test_branch_write_merge_fastforward(spark, tmp_root):
    """Writable branch: fork, mutate the branch through normal ops (main
    unaffected), merge fast-forwards main to the branch state by
    metadata only; a concurrent main commit makes the merge refuse."""
    t = _repo(spark, f"{tmp_root}/br")
    t.extend(spark.createDataFrame(_frame(0)))
    b = t.create_branch("audit")
    assert t.branches() == ["audit"]
    # branch mutations: append + keyed upsert; main must not move
    b.extend(spark.createDataFrame(_frame(6)))
    b.replace_records(spark.createDataFrame(
        pd.DataFrame({"k": ["k0"], "A": [100], "C": ["0"]})
    ))
    assert t.get_full_df().count() == 6
    assert b.get_full_df().count() == 12
    t.merge_branch("audit")
    got = {r["k"]: r["A"] for r in t.get_full_df().collect()}
    assert len(got) == 12 and got["k0"] == 100
    # merged main references branch data: delete_branch must refuse
    with pytest.raises(RuntimeError, match="references branch"):
        t.delete_branch("audit")
    # a rewrite of main releases the reference — but only once the older
    # versions still pointing at branch data fall out of retention
    t.compact()
    with pytest.raises(RuntimeError, match="references branch"):
        t.delete_branch("audit")                 # v2 still time-travelable
    t.vacuum(max_age_seconds=-1, keep_versions=1)
    t.delete_branch("audit")
    assert t.branches() == []
    assert t.get_full_df().count() == 12


def test_branch_merge_conflict_on_main_commit(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/br_conflict")
    t.extend(spark.createDataFrame(_frame(0)))
    b = t.create_branch("x")
    b.extend(spark.createDataFrame(_frame(6)))
    t.extend(spark.createDataFrame(_frame(20, 2)))      # main moves on
    with pytest.raises(RuntimeError, match="re-branch"):
        t.merge_branch("x")
    t.delete_branch("x")                                 # unmerged: no refs


def test_branch_protects_main_dirs_from_vacuum(spark, tmp_root):
    """Main data superseded on MAIN but still referenced by a live
    branch head survives main's vacuum."""
    t = _repo(spark, f"{tmp_root}/br_vac")
    t.extend(spark.createDataFrame(_frame(0)))
    b = t.create_branch("pin")
    t.replace_all(spark.createDataFrame(_frame(20, 2)))  # supersedes v1 data
    t.vacuum(max_age_seconds=-1, keep_versions=1)
    # the branch still reads the forked snapshot in full
    assert b.get_full_df().count() == 6
    t.delete_branch("pin")


def test_dv_composes_with_stats_skipping(spark, tmp_root):
    """A skipping read over a dv'd table prunes files by stats AND hides
    tombstoned rows — the filters compose inside _manifest_df."""
    t = TableRepo(
        f"{tmp_root}/dv_skip", group_cols="C", index_cols="k",
        commit_mode="manifest", stats_cols=["A"], spark=spark,
    )
    t.extend(spark.createDataFrame(_frame(0, 12)))
    t.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["k2", "k7"]})))
    got = sorted(
        r["k"] for r in t.get_full_df_skipping([("A", "between", 0, 7)]).collect()
    )
    assert got == ["k0", "k1", "k3", "k4", "k5", "k6"]


def test_count_rows_metadata_only_and_fallbacks(spark, tmp_root):
    """Stats-collecting tables answer count_rows from the manifest alone;
    deletion vectors or stats-less commits fall back to a real count."""
    t = TableRepo(
        f"{tmp_root}/cnt", group_cols="C", index_cols="k",
        commit_mode="manifest", stats_cols=["A"], spark=spark,
    )
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(6)))
    mf = load_manifest(t._fs(), t.main_path)
    assert all("rows" in c for c in mf["commits"])    # counts recorded
    assert t.count_rows() == 12
    # a dv makes the metadata sum wrong -> must fall back, stay correct
    t.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["k0"]})))
    assert t.count_rows() == 11
    # stats-less table: no rows recorded, fallback path
    t2 = _repo(spark, f"{tmp_root}/cnt2")
    t2.extend(spark.createDataFrame(_frame(0)))
    assert t2.count_rows() == 6


def test_maintain_compacts_only_unhealthy_partitions(spark, tmp_root):
    """maintain() targets partitions over the file-count threshold and
    leaves healthy ones' files untouched."""
    t = _repo(spark, f"{tmp_root}/maint")
    # partition C='0' gets 5 commits of small files; C='1'/'2' get one
    t.extend(spark.createDataFrame(_frame(0)))          # all three groups
    for i in range(4):
        only0 = pd.DataFrame({"k": [f"z{i}"], "A": [100 + i], "C": ["0"]})
        t.extend(spark.createDataFrame(only0))
    healthy_before = {p for p in t.paths if "/C=1/" in p or "/C=2/" in p}
    before = rows(t.get_full_df())
    compacted = t.maintain(max_files_per_partition=3)
    assert compacted == ["0"]
    assert rows(t.get_full_df()) == before
    assert {p for p in t.paths if "/C=1/" in p or "/C=2/" in p} == healthy_before
    n0 = sum(1 for p in t.paths if "/C=0/" in p)
    assert n0 <= 3


def test_dv_with_spilled_lists(spark, tmp_root):
    """Deletion vectors on a manifest-of-manifests table: the dv entry's
    own file list spills too, and the read resolves both refs."""
    t = _spill_repo(spark, f"{tmp_root}/dv_spill")
    t.extend(spark.createDataFrame(_frame(0)))
    t.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["k1", "k4"]})))
    assert sorted(r["k"] for r in t.get_full_df().collect()) == [
        "k0", "k2", "k3", "k5",
    ]
    raw = json.loads(open(os.path.join(
        t.main_path, MANIFEST_DIR, f"v{t.versions()[-1]:020d}.json")).read())
    assert all("files" not in c and "files_ref" in c for c in raw["commits"])


def test_dv_stats_and_maintain_and_keyless_reader(spark, tmp_root):
    """Regressions from review: (a) stats()/maintain() must work on a
    table with live DVs (the _metadata project survives the tombstone
    join); (b) a read-only handle opened WITHOUT index_cols still
    applies the writer's tombstones (key_cols come from the dv entry)."""
    t = _repo(spark, f"{tmp_root}/dv_meta")
    t.extend(spark.createDataFrame(_frame(0)))
    t.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": ["k1"]})))
    st = {r["C"]: r["n_rows"] for r in t.stats().collect()}
    assert sum(st.values()) == 5                      # dv applied in stats
    assert t.maintain(max_files_per_partition=1000) == []
    # keyless reader handle
    ro = TableRepo(t.main_path, group_cols="C", commit_mode="manifest", spark=spark)
    assert sorted(r["k"] for r in ro.get_full_df().collect()) == [
        "k0", "k2", "k3", "k4", "k5",
    ]


def test_spilled_payload_includes_stats_and_rows(spark, tmp_root):
    """The side object carries the WHOLE per-file payload: a stats table
    over the inline threshold keeps its version JSON free of stats/rows
    maps, and skipping + metadata count still work through the ref."""
    t = TableRepo(
        f"{tmp_root}/spill_stats", group_cols="C", index_cols="k",
        commit_mode="manifest", stats_cols=["A"],
        manifest_inline_files_max=0, spark=spark,
    )
    t.extend(spark.createDataFrame(_frame(0, 12)))
    raw = json.loads(open(os.path.join(
        t.main_path, MANIFEST_DIR, f"v{t.versions()[-1]:020d}.json")).read())
    for c in raw["commits"]:
        assert "files_ref" in c
        for k in ("files", "stats", "rows", "blooms"):
            assert k not in c, f"{k} leaked inline past the spill"
    assert t.count_rows() == 12                        # rows via the ref
    got = sorted(r["k"] for r in t.get_full_df_skipping([("A", "<=", 3)]).collect())
    assert got == ["k0", "k1", "k2", "k3"]             # stats via the ref


def test_review_round2_regressions(spark, tmp_root):
    """Second review round: (a) evolve(rewrite=True) refuses to silently
    drop rows with NULL in the new partition columns; (b) merge rejects
    update dicts naming unknown columns; (c) a type-incomparable
    skipping predicate keeps the file (exact result, no TypeError);
    (d) stats()/maintain() on an EMPTY files-mode table return empty,
    not UNRESOLVED_COLUMN."""
    # (a) NULL-new-key rows must not vanish in a spec rewrite
    t = _repo(spark, f"{tmp_root}/rv_evolve")
    df = pd.DataFrame({"k": ["a", "b"], "A": [1, 2], "C": ["0", "1"],
                       "tenant": ["x", None]})
    t.extend(spark.createDataFrame(df))
    with pytest.raises(ValueError, match="NULL in the new partition"):
        t.evolve_partitioning(["C", "tenant"], rewrite=True)
    # (b) typo'd update column fails loudly instead of no-op'ing
    t2 = _repo(spark, f"{tmp_root}/rv_merge")
    t2.extend(spark.createDataFrame(_frame(0)))
    with pytest.raises(ValueError, match="unknown columns"):
        t2.merge(spark.createDataFrame(_frame(0)), update={"Ax": "src.A"})
    # (c) int predicate against a string-statted column: keep + exact
    t3 = TableRepo(
        f"{tmp_root}/rv_skip", group_cols="C", index_cols="k",
        commit_mode="manifest", stats_cols=["C"], spark=spark,
    )
    t3.extend(spark.createDataFrame(_frame(0)))
    got = t3.get_full_df_skipping([("C", ">=", 1)]).count()
    assert got == 4  # C in {'1','2'}: string >= int filters row-side
    # (d) empty files-mode stats
    t4 = TableRepo(f"{tmp_root}/rv_empty", group_cols="C", spark=spark)
    assert t4.stats().count() == 0
    assert t4.maintain() == []


def test_rmw_conflict_detection(spark, tmp_root):
    """Optimistic concurrency for read-modify-write: a commit landing
    between an upsert's read snapshot and its publish raises
    ConcurrentWriteError instead of silently erasing the other writer's
    rows (simulated by staging the interleaving append between baseline
    capture and publish)."""
    from parquetranger_spark.sources.table_repo import ConcurrentWriteError

    t = _repo(spark, f"{tmp_root}/rmw")
    t.extend(spark.createDataFrame(_frame(0)))
    stale = t._rmw_baseline()
    # "concurrent" append into group C='0' lands after the snapshot
    t.extend(spark.createDataFrame(pd.DataFrame(
        {"k": ["zz"], "A": [99], "C": ["0"]})))
    # a rewrite of C='0' computed from the stale snapshot must refuse
    upd = spark.createDataFrame(pd.DataFrame({"k": ["k0"], "A": [7], "C": ["0"]}))
    with pytest.raises(ConcurrentWriteError, match="rerun"):
        t._write(upd, mode="overwrite", dynamic=True, rmw_baseline=stale)
    # untouched partitions do not conflict
    upd1 = spark.createDataFrame(pd.DataFrame({"k": ["k1"], "A": [7], "C": ["1"]}))
    t._write(upd1, mode="overwrite", dynamic=True, rmw_baseline=stale)
    # the real public path still works serially (fresh baseline inside)
    t.replace_records(spark.createDataFrame(pd.DataFrame(
        {"k": ["k2"], "A": [5], "C": ["2"]})))
    got = {r["k"]: r["A"] for r in t.get_full_df().collect()}
    assert got["zz"] == 99 and got["k2"] == 5


def test_changes_between_row_level_upsert_images(spark, tmp_root):
    """row_level=True turns a partition rewrite into true row deltas:
    the changed key emits an update_preimage/update_postimage pair, a
    genuinely new key emits insert, and the rows that merely rode along
    in the rewritten files vanish from the feed entirely."""
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0, 9)))          # v1: C 0/1/2 × 3
    upd = pd.DataFrame(
        {"k": ["k1", "x1"], "A": [100, 200], "C": ["1", "1"]}
    )
    t.replace_records(spark.createDataFrame(upd))          # v2: rewrites C=1

    feed = t.changes_between(1, 2, row_level=True)
    got = sorted((r["k"], r["_change_type"], r["A"]) for r in feed.collect())
    assert got == [
        ("k1", "update_postimage", 100),
        ("k1", "update_preimage", 1),
        ("x1", "insert", 200),
    ]
    # file-granular view of the same window still shows the ride-alongs
    coarse = {(r["k"], r["_change_type"]) for r in t.changes_between(1, 2).collect()}
    assert ("k4", "delete") in coarse and ("k4", "insert") in coarse

    # append-only window degrades to plain inserts (no removed side)
    t.extend(spark.createDataFrame(_frame(9, 3)))          # v3
    ins = t.changes_between(2, 3, row_level=True)
    assert {r["_change_type"] for r in ins.collect()} == {"insert"}

    with pytest.raises(TypeError, match="index_cols"):
        tk = TableRepo(
            f"{tmp_root}/nk", group_cols="C", commit_mode="manifest", spark=spark
        )
        tk.extend(spark.createDataFrame(_frame(0, 6)))
        tk.replace_groups(
            spark.createDataFrame(pd.DataFrame({"k": ["z"], "A": [0], "C": ["0"]}))
        )
        tk.changes_between(1, 2, row_level=True)


def test_delete_where_dv_tombstones_without_rewrite(spark, tmp_root):
    """Predicate delete as a deletion vector: matched rows disappear
    from reads, NULL-predicate rows are kept, zero data files are
    rewritten (the new version only adds the dv commit), and an empty
    match commits nothing."""
    t = _repo(spark, f"{tmp_root}/t")
    pdf = _frame(0, 9)
    pdf.loc[2, "A"] = None                                  # NULL predicate row
    t.extend(spark.createDataFrame(pdf))
    v1_files = {
        (c["dir"], f)
        for c in load_manifest(t._fs(), t.main_path, 1)["commits"]
        for f in c["files"]
    }

    t.delete_where_dv("A >= 5")
    kept = sorted(r["k"] for r in t.get_full_df().collect())
    assert kept == ["k0", "k1", "k2", "k3", "k4"]           # k2 has NULL A → kept

    mf = load_manifest(t._fs(), t.main_path, 2)
    data_files = {
        (c["dir"], f)
        for c in mf["commits"]
        if c.get("kind") != "dv"
        for f in c["files"]
    }
    assert data_files == v1_files                           # no data rewrite
    assert any(c.get("kind") == "dv" for c in mf["commits"])

    t.delete_where_dv("A > 1000")                           # matches nothing
    assert t.versions()[-1] == 2                            # no new version

    with pytest.raises(TypeError, match="manifest"):
        TableRepo(f"{tmp_root}/plain", index_cols="k", spark=spark).delete_where_dv(
            "A > 0"
        )


@pytest.mark.parametrize("partitioned", [False, True])
def test_stream_changes_cdf_feed(spark, tmp_root, tmp_path, partitioned):
    """Streaming change-data-feed: per-version file diffs arrive as
    insert/delete rows stamped with the causing _commit_version, a
    resumed checkpoint streams ONLY versions committed since (no
    replays), and both reader flavors (driver-side simple, one-task-per-
    file partitioned) emit the identical feed."""
    t = _repo(spark, f"{tmp_root}/t{int(partitioned)}")
    t.extend(spark.createDataFrame(_frame(0, 3)))          # v1: C 0/1/2
    upd = pd.DataFrame({"k": ["k1"], "A": [100], "C": ["1"]})
    t.replace_records(spark.createDataFrame(upd))          # v2: rewrite C=1
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ckpt"

    def drain():
        q = (
            t.stream_changes(partitioned=partitioned)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    got = sorted(
        (r["k"], r["A"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(out).collect()
    )
    # v1: three inserts; v2: the C=1 file rewrite = delete of the old
    # row + insert of the new image (file-granular, no ride-alongs here)
    assert got == [
        ("k0", 0, "insert", 1),
        ("k1", 1, "delete", 2),
        ("k1", 1, "insert", 1),
        ("k1", 100, "insert", 2),
        ("k2", 2, "insert", 1),
    ]

    # resume: only the NEW version streams
    t.extend(spark.createDataFrame(_frame(6, 1)))          # v3: k6
    drain()
    got2 = sorted(
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(out).collect()
    )
    assert ("k6", "insert", 3) in got2 and len(got2) == len(got) + 1


def test_sync_from_replication(spark, tmp_root, tmp_path):
    """CDC replica sync: sync_from drains the source's change feed and
    converges the replica to the source's exact content; a re-drain is a
    no-op (per-version fences, recorded even for delete-only versions);
    a later incremental refresh applies only new commits."""
    src = _repo(spark, f"{tmp_root}/src")
    src.extend(spark.createDataFrame(_frame(0, 6)))                 # v1
    src.replace_records(                                            # v2(+)
        spark.createDataFrame(pd.DataFrame({"k": ["k1"], "A": [100], "C": ["1"]}))
    )
    # delete BOTH C=2 keys: the partition empties, so the source commit
    # is prune-only and the CDF version carries ONLY deletes — the case
    # whose fence marker (a fence-only commit) the assertions below pin
    src.delete_records(                                             # v3(+)
        spark.createDataFrame(pd.DataFrame({"k": ["k2", "k5"]}))
    )
    repl = _repo(spark, f"{tmp_root}/repl")
    repl.sync_from(src, checkpoint=f"{tmp_path}/ck")
    assert rows(repl.get_full_df()) == rows(src.get_full_df())

    # every applied batch leaves its (source, hi-version) fence in the
    # replica manifest — the exactly-once marker replays check
    mf = load_manifest(repl._fs(), repl.main_path)
    assert any("fence" in c for c in mf["commits"]), "no sync fence recorded"

    # re-drain: no duplicates, no resurrections
    repl.sync_from(src, checkpoint=f"{tmp_path}/ck")
    assert rows(repl.get_full_df()) == rows(src.get_full_df())

    # incremental refresh picks up only the new commit
    src.extend(spark.createDataFrame(_frame(6, 2)))
    repl.sync_from(src, checkpoint=f"{tmp_path}/ck")
    assert rows(repl.get_full_df()) == rows(src.get_full_df())


@pytest.mark.parametrize("partitioned", [False, True])
def test_stream_changes_dv_deletes(spark, tmp_root, tmp_path, partitioned):
    """Merge-on-read deletes reach CDF subscribers: a deletion-vector
    commit streams as key-only delete rows (key columns filled, others
    NULL), and a dv-bearing bootstrap ships the dv-EFFECTIVE snapshot —
    in both reader flavors."""
    t = _repo(spark, f"{tmp_root}/t{int(partitioned)}")
    t.extend(spark.createDataFrame(_frame(0, 6)))               # v1
    t.delete_records_dv(
        spark.createDataFrame(pd.DataFrame({"k": ["k1", "k4"]}))
    )                                                           # v2 (dv)
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ckpt"

    def drain(df, o, c):
        q = (
            df.writeStream.format("parquet")
            .option("path", o)
            .outputMode("append")
            .option("checkpointLocation", c)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain(t.stream_changes(partitioned=partitioned), out, ckpt)
    got = sorted(
        (r["k"], r["_change_type"], r["_commit_version"], r["A"] is None)
        for r in spark.read.parquet(out).collect()
    )
    # v1: six inserts with values; v2: two key-only deletes (A NULL)
    assert (("k1", "delete", 2, True) in got) and (("k4", "delete", 2, True) in got)
    assert sum(1 for g in got if g[1] == "insert") == 6
    assert sum(1 for g in got if g[1] == "delete") == 2

    # and sync_from converges a dv-using source
    repl = _repo(spark, f"{tmp_root}/repl{int(partitioned)}")
    repl.sync_from(t, checkpoint=f"{tmp_path}/sck")
    assert rows(repl.get_full_df()) == rows(t.get_full_df())

    # dv-bearing BOOTSTRAP: vacuum away v1, start 'earliest' — the
    # snapshot must arrive dv-effective (no k1/k4, no delete rows)
    t.vacuum(max_age_seconds=0, keep_versions=1)
    assert t.versions() == [2]
    drain(
        t.stream_changes(partitioned=partitioned, starting_version="earliest"),
        f"{tmp_path}/boot",
        f"{tmp_path}/boot_ck",
    )
    boot = sorted(
        (r["k"], r["_change_type"]) for r in spark.read.parquet(f"{tmp_path}/boot").collect()
    )
    assert boot == [
        (k, "insert") for k in ["k0", "k2", "k3", "k5"]
    ], f"bootstrap not dv-effective: {boot}"


def test_sync_from_random_op_sequences(spark, tmp_root, tmp_path):
    """Randomized convergence: several seeded random sequences of source
    mutations (append / keyed upsert / copy-on-write delete /
    merge-on-read dv delete / partition overwrite), each followed by an
    incremental sync — after every refresh the replica equals the
    source exactly. Catches interaction bugs no single-shape test pins
    (dv after upsert, overwrite after dv, emptied partitions, …)."""
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        src = _repo(spark, f"{tmp_root}/src{seed}")
        repl = _repo(spark, f"{tmp_root}/repl{seed}")
        ck = f"{tmp_path}/ck{seed}"
        nxt = [0]

        def fresh(n):
            lo = nxt[0]
            nxt[0] += n
            return _frame(lo, n)

        src.extend(spark.createDataFrame(fresh(6)))
        ops = ["append", "upsert", "delete", "dv", "overwrite"]
        for step in range(6):
            op = rng.choice(ops)
            live = sorted(r["k"] for r in src.get_full_df().select("k").collect())
            if op == "append":
                src.extend(spark.createDataFrame(fresh(rng.randint(1, 4))))
            elif op == "upsert" and live:
                pick = rng.sample(live, min(2, len(live)))
                src.replace_records(spark.createDataFrame(pd.DataFrame({
                    "k": pick,
                    "A": [1000 + step] * len(pick),
                    "C": [str(rng.randint(0, 2)) for _ in pick],
                })))
            elif op == "delete" and live:
                pick = rng.sample(live, min(2, len(live)))
                src.delete_records(spark.createDataFrame(pd.DataFrame({"k": pick})))
            elif op == "dv" and live:
                pick = rng.sample(live, min(2, len(live)))
                src.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": pick})))
            elif op == "overwrite":
                g = str(rng.randint(0, 2))
                src.replace_groups(spark.createDataFrame(pd.DataFrame({
                    "k": [f"ow{step}"], "A": [step], "C": [g],
                })))
            # incremental refresh after every mutation batch
            repl.sync_from(src, checkpoint=ck)
            assert rows(repl.get_full_df()) == rows(src.get_full_df()), (
                f"seed {seed} diverged after step {step} ({op})"
            )


def test_stream_versions_metadata_feed(spark, tmp_root, tmp_path):
    """stream_versions(): one row per committed version from the manifest
    JSONs alone — the audit feed / matview trigger; exactly-once resume
    through a checkpoint, no data file ever opened."""
    import pandas as pd

    src = TableRepo(
        tmp_root + "/vsrc", index_cols="k", commit_mode="manifest", spark=spark
    )
    src.extend(spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})))
    src.replace_records(spark.createDataFrame(pd.DataFrame({"k": [2], "v": [9.0]})))
    src.delete_records_dv(spark.createDataFrame(pd.DataFrame({"k": [1]})))

    out = str(tmp_path / "vout")
    ck = str(tmp_path / "vck")
    q = (
        src.stream_versions()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r._version: (r._op, r._n_files) for r in spark.read.parquet(out).collect()
    }
    vs = src.versions()
    assert sorted(got) == vs  # every committed version exactly once
    assert all(n >= 0 for _, n in got.values())
    assert got[vs[0]][0] == "append"
    # resume: one more commit -> exactly one more row
    src.extend(spark.createDataFrame(pd.DataFrame({"k": [3], "v": [3.0]})))
    q2 = (
        src.stream_versions()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == len(src.versions())
