"""FS shim tests: the URI branch (HadoopFS via the JVM gateway) must carry
the full TableRepo life cycle. ``file://`` URIs exercise the exact Hadoop
FileSystem code path that s3a:// / hdfs:// would take, against local disk —
the only remote-FS client available in this container.

Reference binds everything to local pathlib (core.py throughout); the shim
is what makes the same engine run against object stores.
"""

import os

import pandas as pd
import pytest

from parquetranger_spark import TableRepo
from parquetranger_spark.sources.fs import (
    HadoopFS,
    LocalFS,
    basename,
    fs_for,
    join_path,
    parent_dir,
    path_parts,
)

DF1 = pd.DataFrame(
    {"__index": ["a1", "a2", "a3"], "A": [1, 2, 3], "C2": ["a", "b", "a"]}
)
DF_UP = pd.DataFrame({"__index": ["a2", "a4"], "A": [20, 40], "C2": ["b", "a"]})


def test_path_helpers_uri_and_local():
    assert join_path("s3a://bucket/t", "g=1", "f.parquet") == "s3a://bucket/t/g=1/f.parquet"
    assert join_path("/tmp/t", "g=1") == os.path.join("/tmp/t", "g=1")
    assert path_parts("s3a://bucket/t/g=1/f.parquet") == ["bucket", "t", "g=1", "f.parquet"]
    assert basename("hdfs://nn/warehouse/tbl/") == "tbl"
    assert parent_dir("hdfs://nn/warehouse/tbl") == "hdfs://nn/warehouse"
    assert parent_dir("/a/b/c") == "/a/b"


def test_fs_for_dispatch(spark):
    assert isinstance(fs_for("/tmp/x"), LocalFS)
    assert isinstance(fs_for("file:///tmp/x", spark=spark), HadoopFS)


def test_hadoop_fs_text_roundtrip(spark, tmp_root):
    fs = fs_for(f"file://{tmp_root}", spark=spark)
    p = f"file://{tmp_root}/sub/data.json"
    fs.write_text_atomic(p, '{"k": 1}')
    assert fs.exists(p)
    assert fs.read_text(p) == '{"k": 1}'
    # overwrite through the same atomic rename path
    fs.write_text_atomic(p, '{"k": 2}')
    assert fs.read_text(p) == '{"k": 2}'
    fs.delete(f"file://{tmp_root}/sub")
    assert not fs.exists(p)


def test_table_repo_on_file_uri(spark, tmp_root):
    """Full life cycle (append → grouped read → upsert → purge) with a
    URI root: every path op goes through HadoopFS, every data op through
    Spark's own reader/writer on the same URI."""
    root = f"file://{tmp_root}/tab"
    trepo = TableRepo(root, group_cols="C2", index_cols="__index", spark=spark)
    assert isinstance(trepo._fs(), HadoopFS)

    trepo.extend(spark.createDataFrame(DF1))
    assert trepo.n_files > 0
    assert all(p.startswith("file:") for p in trepo.paths)

    got = trepo.get_full_df().toPandas().sort_values("__index").reset_index(drop=True)
    assert sorted(got["__index"]) == ["a1", "a2", "a3"]
    assert sorted(v for v, _ in trepo.get_partition_paths("C2")) == ["a", "b"]

    trepo.replace_records(spark.createDataFrame(DF_UP))
    got = trepo.get_full_df().toPandas().set_index("__index")["A"].to_dict()
    assert got == {"a1": 1, "a2": 20, "a3": 3, "a4": 40}

    # metadata sidecar went through the shim too
    assert trepo.full_metadata == {}
    trepo.purge()
    assert trepo.paths == []
    assert trepo.get_full_df().count() == 0


def test_file_uri_matches_local_result(spark, tmp_root):
    """Same operations on a bare local path and a file:// URI must produce
    identical row sets — the shim changes plumbing, never semantics."""
    local = TableRepo(f"{tmp_root}/loc", group_cols="C2", index_cols="__index", spark=spark)
    remote = TableRepo(
        f"file://{tmp_root}/rem", group_cols="C2", index_cols="__index", spark=spark
    )
    for tr in (local, remote):
        tr.extend(spark.createDataFrame(DF1))
        tr.replace_records(spark.createDataFrame(DF_UP))
    a = local.get_full_df().toPandas().sort_values("__index").reset_index(drop=True)
    b = remote.get_full_df().toPandas().sort_values("__index").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_single_slash_scheme_paths_align():
    """org.apache.hadoop.fs.Path.toString() emits authority-less URIs as
    'file:/x' (single slash); parts must align with the 'file:///x' form
    the path was written under — a mismatch here once made the two-phase
    append list zero staged files and delete the staging dir (data loss).
    """
    assert path_parts("file:/tmp/t/g=1/f.parquet") == path_parts("file:///tmp/t/g=1/f.parquet")
    assert basename("file:/tmp/t") == "t"
    assert parent_dir("file:/tmp/t/x") == "file:/tmp/t"
    # relative alignment between a written root and a Hadoop-listed child
    root_written = "file:///tmp/t/.staging_ab"
    listed_child = "file:/tmp/t/.staging_ab/g=1/part-0.parquet"
    rel = path_parts(listed_child)[len(path_parts(root_written)):]
    assert rel == ["g=1", "part-0.parquet"]


def test_hash_bucket_partitions_visible_on_uri_root(spark, tmp_root):
    """Bucket columns are underscore-prefixed (__pqr_…=N dirs); the
    HadoopFS listing must apply Spark's '=' exception to its
    hidden-component filter or every bucketed partition disappears."""
    from parquetranger_spark import HashPartitioner

    t = TableRepo(
        f"file://{tmp_root}/hb",
        group_cols=HashPartitioner(num_groups=3),
        index_cols="__index",
        spark=spark,
    )
    t.extend(spark.createDataFrame(DF1))
    assert t.n_files > 0
    assert t.get_full_df().count() == len(DF1)


def test_hadoop_create_exclusive_cas_race_and_torn_read_safety(spark, tmp_root):
    """The HadoopFS CAS under contention: 16 threads racing one
    destination — exactly one wins, losers see False (never an
    exception), the winner's bytes are complete, and no .tmp residue of
    the winner is left in the destination's role. Also: a pre-existing
    destination refuses immediately."""
    from concurrent.futures import ThreadPoolExecutor

    fs = fs_for(f"file://{tmp_root}", spark=spark)
    dest = f"file://{tmp_root}/cas/v1.json"
    payloads = [f'{{"writer": {i}, "pad": "{"x" * 2000}"}}' for i in range(16)]

    def attempt(i):
        return fs.create_exclusive(dest, payloads[i])

    with ThreadPoolExecutor(max_workers=16) as ex:
        results = list(ex.map(attempt, range(16)))
    assert sum(results) == 1
    winner = results.index(True)
    assert fs.read_text(dest) == payloads[winner]
    # second round on an existing destination: everyone refuses
    assert fs.create_exclusive(dest, "late") is False
    assert fs.read_text(dest) == payloads[winner]


def test_manifest_concurrent_appends_on_file_uri(spark, tmp_root):
    """The manifest commit protocol through the HadoopFS branch: four
    concurrent appenders on a file:// root compose via CAS retries, with
    the torn-read-safe rename publish."""
    from concurrent.futures import ThreadPoolExecutor

    root = f"file://{tmp_root}/t"
    seed = TableRepo(root, index_cols="__index", commit_mode="manifest", spark=spark)
    seed.extend(spark.createDataFrame(DF1))

    def worker(i):
        r = TableRepo(root, index_cols="__index", commit_mode="manifest", spark=spark)
        pdf = pd.DataFrame({"__index": [f"w{i}_{j}" for j in range(3)], "A": [i] * 3, "C2": ["z"] * 3})
        r.extend(spark.createDataFrame(pdf))

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(worker, range(4)))
    t = TableRepo(root, index_cols="__index", commit_mode="manifest", spark=spark)
    assert t.get_full_df().count() == 3 + 4 * 3
    assert t.versions()[-1] == 5


def test_manifest_soak_16_writers_mixed_ops(spark, tmp_root):
    """Concurrency soak for the manifest protocol — the component the
    whole storage story rests on. 16 threads on one file:// root mixing
    appends, snapshot readers, vacuum sweeps, and shallow clones, with
    the protocol invariants checked throughout:

    - version linearity: one CAS win per commit, no duplicates, final
      version == seed + every append (readers/vacuum/clones add none);
    - no lost commits: the final row set is exactly seed + all appended
      keys (every CAS loser retried and landed);
    - reader snapshot isolation: each reader thread only ever observes a
      committed version's row count, and (appends only) those counts are
      non-decreasing per thread — a torn listing mid-CAS or a vanished
      tmp stat would surface here as an exception or a bogus count.
    """
    from concurrent.futures import ThreadPoolExecutor

    root = f"file://{tmp_root}/soak"

    def repo():
        return TableRepo(root, index_cols="__index", commit_mode="manifest", spark=spark)

    repo().extend(spark.createDataFrame(DF1))
    n_appenders, n_per, n_rows = 10, 2, 3
    valid_counts = {3 + n_rows * k for k in range(n_appenders * n_per + 1)}

    def appender(i):
        r = repo()
        for j in range(n_per):
            pdf = pd.DataFrame(
                {
                    "__index": [f"w{i}_{j}_{k}" for k in range(n_rows)],
                    "A": [i] * n_rows,
                    "C2": ["z"] * n_rows,
                }
            )
            r.extend(spark.createDataFrame(pdf))

    def reader(i):
        r = repo()
        out = []
        for _ in range(5):
            out.append(r.get_full_df().count())
            vs = r.versions()  # capture ONCE — it moves under concurrent commits
            assert vs == sorted(set(vs))
        return ("reader", i, out)

    def vacuumer():
        r = repo()
        for _ in range(4):
            # age gate keeps in-flight commits safe; keep_versions deeper
            # than the total commit count so no reader's snapshot vanishes
            r.vacuum(max_age_seconds=3600, keep_versions=64)
        return ("vacuum", 0, [])

    def cloner(j):
        r = repo()
        c = r.clone_to(f"{tmp_root}/soak_clone_{j}")
        n = c.get_full_df().count()
        assert n in valid_counts
        return ("clone", j, [n])

    jobs = (
        [lambda i=i: appender(i) for i in range(n_appenders)]
        + [lambda i=i: reader(i) for i in range(3)]
        + [vacuumer]
        + [lambda j=j: cloner(j) for j in range(2)]
    )
    with ThreadPoolExecutor(max_workers=16) as ex:
        results = [f.result() for f in [ex.submit(j) for j in jobs]]

    for kind, i, counts in filter(None, results):
        if kind == "reader":
            assert counts == sorted(counts), f"reader {i} saw time-travel: {counts}"
            assert set(counts) <= valid_counts, f"reader {i} saw a torn count: {counts}"

    t = repo()
    expect = {r[0] for r in DF1[["__index"]].itertuples(index=False)} | {
        f"w{i}_{j}_{k}"
        for i in range(n_appenders)
        for j in range(n_per)
        for k in range(n_rows)
    }
    got = [r["__index"] for r in t.get_full_df().select("__index").collect()]
    assert sorted(got) == sorted(expect), "lost or duplicated commit rows"
    assert t.versions()[-1] == 1 + n_appenders * n_per
    assert t.versions() == sorted(set(t.versions()))


def test_manifest_soak_vacuum_tags_dv_wap(spark, tmp_root):
    """Round-5 soak: the round-4 commit kinds (deletion vectors, WAP
    staged publishes, branches, tags) under concurrent aggressive
    vacuum(keep_versions=4). Invariants proven under load:

    - retention/tag protection: a tagged snapshot stays readable however
      hard vacuum prunes untagged versions;
    - branch protection: a live branch's referenced data dirs survive
      main-root vacuums while the branch exists;
    - dv composition: tombstones land as plain append commits, compose
      with concurrent appends/WAP publishes, and the final row set is
      exactly seed + appends - dv-deleted keys;
    - WAP: a staged commit published mid-soak is atomic — readers never
      observe its rows before publish, never lose them after.
    """
    from concurrent.futures import ThreadPoolExecutor

    root = f"file://{tmp_root}/soak5"

    def repo():
        return TableRepo(root, index_cols="__index", commit_mode="manifest", spark=spark)

    seed = pd.DataFrame(
        {"__index": [f"s{k}" for k in range(6)], "A": list(range(6)), "C2": ["z"] * 6}
    )
    t0 = repo()
    t0.extend(spark.createDataFrame(seed))
    t0.tag("soak-seed")  # must survive every vacuum below

    n_app, n_per = 4, 2

    def appender(i):
        r = repo()
        for j in range(n_per):
            pdf = pd.DataFrame(
                {
                    "__index": [f"w{i}_{j}_{k}" for k in range(2)],
                    "A": [i] * 2,
                    "C2": ["z"] * 2,
                }
            )
            r.extend(spark.createDataFrame(pdf))

    def wap(i):
        r = repo()
        pdf = pd.DataFrame(
            {"__index": [f"wap{i}_{k}" for k in range(2)], "A": [90 + i] * 2, "C2": ["w"] * 2}
        )
        sc = r.stage_extend(spark.createDataFrame(pdf))
        assert sc.dataframe().count() == 2  # audit against exactly the staged files
        sc.publish()

    def dv_deleter(i):
        r = repo()
        # each deleter tombstones its own disjoint pair of seed keys
        keys = pd.DataFrame({"__index": [f"s{2 * i}", f"s{2 * i + 1}"]})
        r.delete_records_dv(spark.createDataFrame(keys))

    def vacuumer(i):
        r = repo()
        for _ in range(4):
            r.vacuum(max_age_seconds=3600, keep_versions=4)
        return None

    def tagged_reader(i):
        r = repo()
        for _ in range(4):
            got = {x["__index"] for x in r.get_tagged_df("soak-seed").collect()}
            assert got == set(seed["__index"]), "tagged snapshot mutated/vacuumed"
            r.get_full_df().count()  # live read must never error mid-soak
        return None

    def brancher():
        r = repo()
        b = r.create_branch("soak-br")
        b.extend(
            spark.createDataFrame(
                pd.DataFrame({"__index": ["br0"], "A": [0], "C2": ["b"]})
            )
        )
        assert b.get_full_df().where("__index = 'br0'").count() == 1
        r.delete_branch("soak-br", force=True)

    jobs = (
        [lambda i=i: appender(i) for i in range(n_app)]
        + [lambda i=i: wap(i) for i in range(2)]
        + [lambda i=i: dv_deleter(i) for i in range(2)]
        + [lambda i=i: vacuumer(i) for i in range(2)]
        + [lambda i=i: tagged_reader(i) for i in range(2)]
        + [brancher]
    )
    with ThreadPoolExecutor(max_workers=13) as ex:
        for f in [ex.submit(j) for j in jobs]:
            f.result()

    t = repo()
    expect = (
        {f"s{k}" for k in range(6)}
        - {f"s{2 * i}" for i in range(2)}
        - {f"s{2 * i + 1}" for i in range(2)}
    ) | {
        f"w{i}_{j}_{k}" for i in range(n_app) for j in range(n_per) for k in range(2)
    } | {f"wap{i}_{k}" for i in range(2) for k in range(2)}
    got = sorted(r["__index"] for r in t.get_full_df().select("__index").collect())
    assert got == sorted(expect), "lost/duplicated/resurrected rows under soak"
    # the tag still resolves after every vacuum, with the full seed
    assert {
        x["__index"] for x in t.get_tagged_df("soak-seed").collect()
    } == set(seed["__index"])
