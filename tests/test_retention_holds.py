"""Round-8 retention holds (verdict #7): streams register/advance a
hold at their checkpoint horizon; vacuum() refuses to prune held
versions; stale holds expire by age. Prevention, where the previous
contract was a clear error after the manifest was already gone."""

import pandas as pd
import pytest

from parquetranger_spark import TableRepo


def _repo(spark, root):
    return TableRepo(root, index_cols="k", commit_mode="manifest", spark=spark)


def _frame(lo, n=4):
    return pd.DataFrame({"k": [f"k{i}" for i in range(lo, lo + n)], "v": range(lo, lo + n)})


def test_vacuum_skips_held_versions(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    for lo in (0, 4, 8):
        t.extend(spark.createDataFrame(_frame(lo)))
    assert t.versions() == [1, 2, 3]
    t.register_retention_hold("backfill", version=2)
    assert t.retention_holds()["backfill"]["version"] == 2
    t.vacuum(max_age_seconds=0, keep_versions=1)
    # v1 pruned; v2 and everything after it held
    assert t.versions() == [2, 3]
    assert sorted(r["k"] for r in t.get_full_df().collect()) == sorted(
        f"k{i}" for i in range(12)
    )
    t.release_retention_hold("backfill")
    assert "backfill" not in t.retention_holds()
    t.vacuum(max_age_seconds=0, keep_versions=1)
    assert t.versions() == [3]


def test_stream_hold_survives_vacuum_and_resumes(spark, tmp_root, tmp_path):
    t = _repo(spark, f"{tmp_root}/t")
    t.extend(spark.createDataFrame(_frame(0)))
    t.extend(spark.createDataFrame(_frame(4)))
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ck"

    def drain():
        q = (
            t.stream_manifest(hold="consumer1")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    # the stream pinned its horizon as a live hold (at or BELOW the
    # committed offset — planning-time pins may lag the commit; lagging
    # low over-retains, which is the safe direction)
    holds = t.retention_holds()
    assert holds["consumer1"]["version"] <= 2
    t.extend(spark.createDataFrame(_frame(8)))
    # harshest retention: without the hold this would prune v2 and the
    # resume below would fail with the vacuumed-manifest error
    t.vacuum(max_age_seconds=0, keep_versions=1)
    assert 2 in t.versions()
    drain()  # resumes from the held horizon, drains only v3
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == sorted(f"k{i}" for i in range(12))  # no loss, no dupes
    # the hold advanced with the second drain
    assert t.retention_holds()["consumer1"]["version"] >= 2


def test_expired_holds_are_swept(spark, tmp_root):
    t = _repo(spark, f"{tmp_root}/t")
    for lo in (0, 4):
        t.extend(spark.createDataFrame(_frame(lo)))
    t.register_retention_hold("stale", version=1)
    # expiry 0: the hold is stale by definition — ignored AND swept
    t.vacuum(max_age_seconds=0, keep_versions=1, hold_expiry_seconds=0)
    assert t.versions() == [2]
    assert t.retention_holds() == {}


def test_hold_requires_manifest_mode_and_valid_name(spark, tmp_root):
    t = TableRepo(f"{tmp_root}/files", index_cols="k", spark=spark)
    with pytest.raises(TypeError, match="manifest"):
        t.register_retention_hold("x")
    m = _repo(spark, f"{tmp_root}/m")
    m.extend(spark.createDataFrame(_frame(0)))
    with pytest.raises(ValueError, match="bad hold name"):
        m.register_retention_hold("a/b")


def test_sync_from_hold_protects_source(spark, tmp_root, tmp_path):
    """A replica syncing with hold= pins the SOURCE's manifests at its
    checkpoint horizon — a harsh source-side vacuum between refreshes
    cannot strand the replica."""
    src = _repo(spark, f"{tmp_root}/src")
    repl = _repo(spark, f"{tmp_root}/repl")
    src.extend(spark.createDataFrame(_frame(0)))
    src.extend(spark.createDataFrame(_frame(4)))
    repl.sync_from(src, checkpoint=f"{tmp_path}/ck", hold="replica1")
    assert "replica1" in src.retention_holds()
    src.extend(spark.createDataFrame(_frame(8)))
    src.vacuum(max_age_seconds=0, keep_versions=1)
    repl.sync_from(src, checkpoint=f"{tmp_path}/ck", hold="replica1")
    assert sorted(r["k"] for r in repl.get_full_df().collect()) == sorted(
        f"k{i}" for i in range(12)
    )
