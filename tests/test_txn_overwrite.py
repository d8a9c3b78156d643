"""Declared overwrites inside multi-table transactions (verdict r5 #4):
``Transaction.replace_groups`` / ``replace_all`` publish an additive
entry carrying a deferred-overwrite spec (``ow``); the prune of the
files they replace becomes visible atomically with the txn marker
(manifest.effective_commits) and is physically folded into the chain by
the next publish (manifest.fold_decided_overwrites)."""

import json

import pytest
from pyspark.sql import functions as F

from parquetranger_spark.sources.table_repo import TableRepo
from parquetranger_spark.sources.txn import Transaction


def _repo(spark, root, **kw):
    return TableRepo(
        root, group_cols="g", index_cols="k", commit_mode="manifest", spark=spark, **kw
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, v double")


def _vals(t):
    return {(r.k, r.g, r.v) for r in t.get_full_df().collect()}


def test_txn_replace_groups_pending_invisible_then_atomic(spark, tmp_root):
    facts = _repo(spark, f"{tmp_root}/facts")
    summary = _repo(spark, f"{tmp_root}/summary")
    facts.extend(_df(spark, [(1, "A", 1.0), (2, "A", 2.0), (3, "B", 3.0)]))
    summary.extend(_df(spark, [(0, "S", 3.0)]))

    t = Transaction(f"{tmp_root}/cat")
    t.replace_groups(facts, _df(spark, [(9, "A", 99.0)]))
    t.extend(summary, _df(spark, [(1, "S", 99.0)]))

    # pending: BOTH tables show their pre-txn state through every surface
    assert _vals(facts) == {(1, "A", 1.0), (2, "A", 2.0), (3, "B", 3.0)}
    assert facts.count_rows() == 3
    assert sorted(facts.partition_values()) == ["A", "B"]
    assert summary.count_rows() == 1

    t.commit()
    # committed: partition A replaced, B untouched — atomically with the
    # summary append
    assert _vals(facts) == {(9, "A", 99.0), (3, "B", 3.0)}
    assert facts.count_rows() == 2
    assert summary.count_rows() == 2


def test_txn_replace_groups_abort_leaves_table_unchanged(spark, tmp_root):
    facts = _repo(spark, f"{tmp_root}/facts")
    facts.extend(_df(spark, [(1, "A", 1.0), (3, "B", 3.0)]))
    t = Transaction(f"{tmp_root}/cat")
    t.replace_groups(facts, _df(spark, [(9, "A", 99.0)]))
    t.abort()
    assert _vals(facts) == {(1, "A", 1.0), (3, "B", 3.0)}
    assert facts.sweep_aborted_txns() >= 1
    assert _vals(facts) == {(1, "A", 1.0), (3, "B", 3.0)}


def test_txn_replace_all_truncates_and_keeps_fences(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend_fenced(_df(spark, [(1, "A", 1.0)]), fence=("s", 7))
    t.extend(_df(spark, [(2, "B", 2.0)]))

    x = Transaction(f"{tmp_root}/cat")
    x.replace_all(t, _df(spark, [(5, "C", 5.0)]))
    assert _vals(t) == {(1, "A", 1.0), (2, "B", 2.0)}  # pending
    x.commit()
    assert _vals(t) == {(5, "C", 5.0)}
    # the fence tombstone survived the transactional truncation: a
    # replayed epoch must still no-op
    t.extend_fenced(_df(spark, [(1, "A", 1.0)]), fence=("s", 7))
    assert _vals(t) == {(5, "C", 5.0)}


def test_fold_settles_committed_overwrite_physically(spark, tmp_root):
    from parquetranger_spark.sources.manifest import load_manifest

    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_df(spark, [(1, "A", 1.0), (3, "B", 3.0)]))
    x = Transaction(f"{tmp_root}/cat")
    x.replace_groups(t, _df(spark, [(9, "A", 99.0)]))
    x.commit()
    # the current manifest still carries the deferred spec...
    mf = load_manifest(t._fs(), t.main_path)
    assert any("ow" in c for c in mf["commits"])
    want = _vals(t)
    # ...and the NEXT publish folds it: no ow keys remain, the replaced
    # files are physically pruned, reads unchanged
    t.extend(_df(spark, [(7, "C", 7.0)]))
    mf2 = load_manifest(t._fs(), t.main_path)
    assert not any("ow" in c or "txn" in c for c in mf2["commits"])
    a_files = [
        f
        for c in mf2["commits"]
        for f in c["files"]
        if "g=A" in f
    ]
    assert len(a_files) > 0
    assert _vals(t) == want | {(7, "C", 7.0)}
    assert t.count_rows() == 3


def test_crash_pending_then_late_decision(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_df(spark, [(1, "A", 1.0)]))
    x = Transaction(f"{tmp_root}/cat")
    x.replace_all(t, _df(spark, [(5, "C", 5.0)]))
    # coordinator "crashes": marker unwritten, entry stays invisible —
    # including across a fresh handle
    t2 = TableRepo.open(t.main_path, spark=spark)
    assert _vals(t2) == {(1, "A", 1.0)}
    # late decision from a re-created handle (same txn_id)
    Transaction(f"{tmp_root}/cat", txn_id=x.txn_id).commit()
    assert _vals(t2) == {(5, "C", 5.0)}


def test_cdf_emits_overwrite_as_delete_plus_insert(spark, tmp_root, tmp_path):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_df(spark, [(1, "A", 1.0), (3, "B", 3.0)]))  # v1
    x = Transaction(f"{tmp_root}/cat")
    x.replace_groups(t, _df(spark, [(9, "A", 99.0)]))  # v2 (gated)
    x.commit()

    got = {
        (r.k, r._change_type)
        for r in t.changes_between(1).collect()
    }
    assert got == {(1, "delete"), (9, "insert")}

    q = (
        t.stream_changes()
        .writeStream.format("parquet")
        .option("path", f"{tmp_path}/out")
        .option("checkpointLocation", f"{tmp_path}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.read.parquet(f"{tmp_path}/out").collect()
    ow_ver = {
        (r.k, r._change_type) for r in rows if r._commit_version == 2
    }
    assert ow_ver == {(1, "delete"), (9, "insert")}


def test_mixed_spec_refuses_txn_replace_groups(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_df(spark, [(1, "A", 1.0)]))
    t.evolve_partitioning(["g", "k"])  # lazy: old commit keeps old spec
    t2 = TableRepo.open(t.main_path, spark=spark)
    x = Transaction(f"{tmp_root}/cat")
    with pytest.raises(RuntimeError, match="partition spec"):
        x.replace_groups(t2, _df(spark, [(9, "A", 99.0)]))


def test_txn_overwrite_refuses_masking_pending_txn(spark, tmp_root):
    """Self-review regression: an ow entry must not silently mask an
    entry gated on a DIFFERENT undecided transaction — that txn's later
    commit would apply only its other tables' writes (torn). The
    overwrite conflicts loudly instead; once the other txn is decided it
    proceeds."""
    from parquetranger_spark.sources.table_repo import ConcurrentWriteError

    t = _repo(spark, f"{tmp_root}/t")
    t.extend(_df(spark, [(1, "A", 1.0), (2, "B", 2.0)]))
    a = Transaction(f"{tmp_root}/cat")
    a.extend(t, _df(spark, [(5, "A", 5.0)]))  # pending entry in partition A

    b = Transaction(f"{tmp_root}/cat")
    with pytest.raises(ConcurrentWriteError, match="undecided"):
        b.replace_groups(t, _df(spark, [(9, "A", 9.0)]))
    with pytest.raises(ConcurrentWriteError, match="undecided"):
        Transaction(f"{tmp_root}/cat").replace_all(t, _df(spark, [(7, "C", 7.0)]))
    # disjoint partitions don't conflict
    c = Transaction(f"{tmp_root}/cat")
    c.replace_groups(t, _df(spark, [(8, "B", 8.0)]))
    c.commit()
    # decide txn A → the overwrite now proceeds and masks A's rows too
    a.commit()
    assert _vals(t) == {(1, "A", 1.0), (5, "A", 5.0), (8, "B", 8.0)}
    d = Transaction(f"{tmp_root}/cat")
    d.replace_groups(t, _df(spark, [(9, "A", 9.0)]))
    d.commit()
    assert _vals(t) == {(9, "A", 9.0), (8, "B", 8.0)}


def test_concurrent_txn_overwrites_and_appends_soak(spark, tmp_root):
    """Soak: six transactional partition overwrites (each paired with an
    append to a second table) race plain appends to disjoint partitions
    and a polling reader. Invariants at the end: every committed txn is
    all-or-nothing ACROSS tables (facts partition replaced ⇔ summary row
    present), plain appends all survive, the chain folds clean (no ow
    markers left after a final publish), and no read ever crashed."""
    import threading

    facts = _repo(spark, f"{tmp_root}/facts")
    summary = TableRepo(
        f"{tmp_root}/summary", index_cols="k", commit_mode="manifest", spark=spark
    )
    # seed every partition the txns will overwrite
    facts.extend(
        _df(spark, [(i, f"T{i}", 0.0) for i in range(6)] + [(100, "P0", 1.0)])
    )
    summary.extend(spark.createDataFrame([(999, "seed", 0.0)], "k int, g string, v double"))
    errors = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                facts.get_full_df().count()
                facts.count_rows()
            except Exception as e:  # noqa: BLE001
                errors.append(("reader", repr(e)))
                return

    def txn_worker(i):
        try:
            x = Transaction(f"{tmp_root}/cat")
            x.replace_groups(facts, _df(spark, [(1000 + i, f"T{i}", 9.0)]))
            x.extend(
                summary,
                spark.createDataFrame([(i, "done", 1.0)], "k int, g string, v double"),
            )
            x.commit()
        except Exception as e:  # noqa: BLE001
            errors.append((f"txn{i}", repr(e)))

    def append_worker(i):
        try:
            facts.extend(_df(spark, [(200 + i, f"P{i}", 2.0)]))
        except Exception as e:  # noqa: BLE001
            errors.append((f"append{i}", repr(e)))

    r = threading.Thread(target=reader)
    r.start()
    workers = [threading.Thread(target=txn_worker, args=(i,)) for i in range(6)]
    workers += [threading.Thread(target=append_worker, args=(i,)) for i in range(4)]
    for w in workers:
        w.start()
    for w in workers:
        w.join()
    stop.set()
    r.join()
    assert not errors, errors

    rows = {(r.k, r.g, r.v) for r in facts.get_full_df().collect()}
    # every txn overwrite landed whole: old T_i row gone, new row present,
    # and its summary row exists
    sm = {r.k for r in summary.get_full_df().collect()}
    for i in range(6):
        assert (1000 + i, f"T{i}", 9.0) in rows and (i, f"T{i}", 0.0) not in rows
        assert i in sm
    # appends to disjoint partitions all survived
    for i in range(4):
        assert (200 + i, f"P{i}", 2.0) in rows
    assert (100, "P0", 1.0) in rows  # untouched partition intact
    # a final publish folds every decided overwrite out of the chain
    facts.extend(_df(spark, [(300, "Z", 3.0)]))
    from parquetranger_spark.sources.manifest import load_manifest

    mf = load_manifest(facts._fs(), facts.main_path)
    assert not any("ow" in c or "txn" in c for c in mf["commits"])
    assert facts.count_rows() == len(rows) + 1
