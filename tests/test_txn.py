"""Multi-table transaction tier (sources/txn.py): all-or-nothing
visibility across TableRepos, gated on one marker CAS. No reference
counterpart (core.py locks are per-path, single-table); the contract
modeled is the lakehouse catalog-level multi-table commit."""

import os
import threading

import pandas as pd
import pytest

from parquetranger_spark import TableRepo, Transaction, TransactionError
from parquetranger_spark.sources.table_repo import ConcurrentWriteError


def _mk(spark, root, name, **kw):
    kw.setdefault("commit_mode", "manifest")
    return TableRepo(os.path.join(root, name), spark=spark, **kw)


def _pdf(spark, rows, cols):
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


@pytest.fixture()
def two_tables(spark, tmp_root):
    facts = _mk(spark, tmp_root, "facts", group_cols="g", index_cols="id")
    summary = _mk(spark, tmp_root, "summary", index_cols="g")
    facts.extend(_pdf(spark, [(1, "a", 10.0), (2, "b", 20.0)], ["id", "g", "v"]))
    summary.extend(_pdf(spark, [("a", 10.0), ("b", 20.0)], ["g", "total"]))
    return facts, summary


def test_txn_all_or_nothing(spark, tmp_root, two_tables):
    facts, summary = two_tables
    t = Transaction(os.path.join(tmp_root, "_txns"))
    t.extend(facts, _pdf(spark, [(3, "a", 5.0)], ["id", "g", "v"]))
    t.replace_records(summary, _pdf(spark, [("a", 15.0)], ["g", "total"]))

    # before the decision: NOTHING is visible on either table
    assert facts.get_full_df().count() == 2
    assert summary.get_full_df().where("g='a'").collect()[0]["total"] == 10.0
    assert t.state == "pending"

    t.commit()
    assert t.state == "committed"
    # after one marker CAS: BOTH tables flip
    assert facts.get_full_df().count() == 3
    assert summary.get_full_df().where("g='a'").collect()[0]["total"] == 15.0
    # upsert semantics: the key was replaced, not duplicated
    assert summary.get_full_df().where("g='a'").count() == 1
    assert summary.get_full_df().count() == 2


def test_txn_abort_hides_forever_and_sweeps(spark, tmp_root, two_tables):
    facts, summary = two_tables
    t = Transaction(os.path.join(tmp_root, "_txns"))
    t.extend(facts, _pdf(spark, [(9, "a", 1.0)], ["id", "g", "v"]))
    t.replace_records(summary, _pdf(spark, [("b", 99.0)], ["g", "total"]))
    t.abort()
    assert facts.get_full_df().count() == 2
    assert summary.get_full_df().where("g='b'").collect()[0]["total"] == 20.0
    with pytest.raises(TransactionError):
        t.extend(facts, _pdf(spark, [(10, "a", 1.0)], ["id", "g", "v"]))
    with pytest.raises(TransactionError):
        t.commit()
    # sweep physically drops the aborted entries (facts: 1 append;
    # summary: 1 dv + 1 append)
    assert facts.sweep_aborted_txns() == 1
    assert summary.sweep_aborted_txns() == 2
    assert facts.sweep_aborted_txns() == 0  # idempotent
    assert facts.get_full_df().count() == 2
    assert summary.get_full_df().count() == 2


def test_txn_metadata_surfaces_are_gated(spark, tmp_root, two_tables):
    facts, _ = two_tables
    base_rows = facts.count_rows()
    base_paths = set(facts.paths)
    base_files = facts.files_df().count()
    t = Transaction(os.path.join(tmp_root, "_txns"))
    t.extend(facts, _pdf(spark, [(3, "a", 5.0), (4, "b", 6.0)], ["id", "g", "v"]))
    # every metadata face agrees with the scan: pending rows don't exist
    assert facts.count_rows() == base_rows
    assert set(facts.paths) == base_paths
    assert facts.files_df().count() == base_files
    t.commit()
    assert facts.count_rows() == base_rows + 2
    assert facts.files_df().count() > base_files
    assert len(facts.paths) > len(base_paths)


def test_txn_decision_race_single_winner(spark, tmp_root, two_tables):
    facts, _ = two_tables
    t = Transaction(os.path.join(tmp_root, "_txns"))
    t.extend(facts, _pdf(spark, [(3, "a", 5.0)], ["id", "g", "v"]))
    # two coordinators (same txn id — a failover retry) race the decision
    other = Transaction(os.path.join(tmp_root, "_txns"), txn_id=t.txn_id)
    outcomes = []
    errs = []

    def decide(handle, outcome):
        try:
            (handle.commit if outcome == "committed" else handle.abort)()
            outcomes.append(outcome)
        except TransactionError as e:
            errs.append(str(e))

    th1 = threading.Thread(target=decide, args=(t, "committed"))
    th2 = threading.Thread(target=decide, args=(other, "aborted"))
    th1.start(); th2.start(); th1.join(); th2.join()
    # exactly one outcome wins; the loser raised
    assert len(outcomes) == 1 and len(errs) == 1
    assert t.state in ("committed", "aborted")
    visible = facts.get_full_df().count()
    assert visible == (3 if t.state == "committed" else 2)


def test_txn_keyed_rewrite_conflicts_with_pending(spark, tmp_root, two_tables):
    facts, _ = two_tables
    t = Transaction(os.path.join(tmp_root, "_txns"))
    t.extend(facts, _pdf(spark, [(3, "a", 5.0)], ["id", "g", "v"]))
    # a non-transactional keyed upsert touching partition 'a' must refuse:
    # its rewrite would prune the undecided entry's files
    with pytest.raises(ConcurrentWriteError):
        facts.replace_records(_pdf(spark, [(1, "a", 11.0)], ["id", "g", "v"]))
    # partition 'b' holds no pending files — but the upsert rewrite is
    # conservative only about touched partitions, so this one lands
    facts.replace_records(_pdf(spark, [(2, "b", 21.0)], ["id", "g", "v"]))
    t.commit()
    df = facts.get_full_df().toPandas().set_index("id")
    assert df.loc[2, "v"] == 21.0 and df.loc[3, "v"] == 5.0
    # after the decision the rewrite goes through
    facts.replace_records(_pdf(spark, [(1, "a", 12.0)], ["id", "g", "v"]))
    assert facts.get_full_df().toPandas().set_index("id").loc[1, "v"] == 12.0


def test_txn_upsert_after_delete_ordering(spark, tmp_root):
    # replace_records inside a txn: the dv tombstone sits BELOW the new
    # rows, so the txn's own inserts survive while older rows die
    repo = _mk(spark, tmp_root, "t", index_cols="id")
    repo.extend(_pdf(spark, [(1, "old"), (2, "keep")], ["id", "tag"]))
    t = Transaction(os.path.join(tmp_root, "_txns"))
    t.replace_records(repo, _pdf(spark, [(1, "new")], ["id", "tag"]))
    t.commit()
    got = {r["id"]: r["tag"] for r in repo.get_full_df().collect()}
    assert got == {1: "new", 2: "keep"}


def test_txn_time_travel_retroactive_visibility(spark, tmp_root, two_tables):
    facts, _ = two_tables
    t = Transaction(os.path.join(tmp_root, "_txns"))
    t.extend(facts, _pdf(spark, [(3, "a", 5.0)], ["id", "g", "v"]))
    v_published = facts.versions()[-1]
    assert facts.get_full_df(version=v_published).count() == 2  # gated
    t.commit()
    # the entry belongs to the version that published it — committing
    # makes it visible there too (same rule as the batch CDF)
    assert facts.get_full_df(version=v_published).count() == 3


def test_txn_change_feed_and_stream_hold_at_frontier(spark, tmp_root, two_tables):
    facts, _ = two_tables
    v0 = facts.versions()[-1]
    t = Transaction(os.path.join(tmp_root, "_txns"))
    t.extend(facts, _pdf(spark, [(3, "a", 5.0)], ["id", "g", "v"]))
    v1 = facts.versions()[-1]
    # batch CDF: pending entry contributes nothing to the diff
    assert facts.changes_between(v0, v1).count() == 0
    t.commit()
    feed = facts.changes_between(v0, v1)
    assert feed.count() == 1
    assert feed.collect()[0]["_change_type"] == "insert"


def test_txn_stream_frontier_blocks_then_advances(spark, tmp_root):
    repo = _mk(spark, tmp_root, "s", index_cols="id")
    repo.extend(_pdf(spark, [(1, 1.0)], ["id", "v"]))
    t = Transaction(os.path.join(tmp_root, "_txns"))
    t.extend(repo, _pdf(spark, [(2, 2.0)], ["id", "v"]))
    repo.extend(_pdf(spark, [(3, 3.0)], ["id", "v"]))  # lands ABOVE the pending v

    ckpt = os.path.join(tmp_root, "ckpt")
    out1 = os.path.join(tmp_root, "out1")

    def drain():
        q = (
            repo.stream_manifest()
            .writeStream.format("parquet")
            .option("path", out1)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got = spark.read.parquet(out1)
    # the stream stops BELOW the undecided version: only the pre-txn row
    assert {r["id"] for r in got.collect()} == {1}
    t.commit()
    drain()
    got = spark.read.parquet(out1)
    # after the decision the frontier advances and BOTH held versions
    # (the txn append and the plain append above it) drain in order
    assert {r["id"] for r in got.collect()} == {1, 2, 3}


def test_txn_compaction_refuses_while_pending(spark, tmp_root, two_tables):
    facts, _ = two_tables
    t = Transaction(os.path.join(tmp_root, "_txns"))
    t.extend(facts, _pdf(spark, [(3, "a", 5.0)], ["id", "g", "v"]))
    # static rewrite would destroy the undecided entry — must refuse
    with pytest.raises(ConcurrentWriteError):
        facts.compact()
    t.abort()
    facts.sweep_aborted_txns()
    facts.compact()  # clean after sweep
    assert facts.get_full_df().count() == 2
