"""Metadata-only schema DDL (Iceberg field-id evolution / Delta column
mapping shape): ADD / RENAME / DROP / widen on manifest tables without
touching a single data file. The reference's only evolution story rewrites
every file (core.py:411-421); these tests pin the lakehouse replacement."""

import threading

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquetranger_spark.sources.table_repo import TableRepo


def _repo(spark, root, **kw):
    kw.setdefault("commit_mode", "manifest")
    kw.setdefault("single_writer", True)
    return TableRepo(root + "/t", spark=spark, **kw)


def _seed(spark, n=4, base=0):
    return spark.createDataFrame(
        [Row(k=base + i, v=float(base + i), s=f"s{base + i}") for i in range(n)]
    )


def test_rename_is_metadata_only_and_maps_old_files(spark, tmp_root):
    t = _repo(spark, tmp_root)
    t.extend(_seed(spark))
    files_before = sorted(t.paths)
    t.rename_column("v", "value")
    assert sorted(t.paths) == files_before  # no rewrite
    df = t.get_full_df()
    assert "value" in df.columns and "v" not in df.columns
    got = {(r.k, r.value) for r in df.collect()}
    assert got == {(i, float(i)) for i in range(4)}
    # writes after the rename land under the new name and read merged
    t.extend(_seed(spark, base=10).withColumnRenamed("v", "value"))
    assert t.get_full_df().where(F.col("value") >= 10).count() == 4


def test_add_column_nulls_for_old_files(spark, tmp_root):
    t = _repo(spark, tmp_root)
    t.extend(_seed(spark))
    t.add_column("w", "double")
    t.extend(
        _seed(spark, base=100).withColumn("w", F.col("v") * 2)
    )
    rows = {r.k: r.w for r in t.get_full_df().collect()}
    assert all(rows[i] is None for i in range(4))
    assert rows[100] == 200.0


def test_drop_then_readd_does_not_resurrect(spark, tmp_root):
    t = _repo(spark, tmp_root)
    t.extend(_seed(spark))
    t.drop_column("s")
    assert "s" not in t.get_full_df().columns
    t.add_column("s", "string")
    t.extend(_seed(spark, base=50))
    rows = {r.k: r.s for r in t.get_full_df().collect()}
    # old files' physical 's' is a DIFFERENT field id — must read as null
    assert all(rows[i] is None for i in range(4))
    assert rows[50] == "s50"


def test_widen_type_casts_old_files(spark, tmp_root):
    t = _repo(spark, tmp_root)
    t.extend(spark.createDataFrame([Row(k=1, n=7)], "k long, n int"))
    t.alter_column_type("n", "bigint")
    df = t.get_full_df()
    assert dict(df.dtypes)["n"] == "bigint"
    assert df.where(F.col("n") == 7).count() == 1
    with pytest.raises(ValueError):
        t.alter_column_type("n", "int")  # narrowing refused


def test_rename_chain_and_upsert_interplay(spark, tmp_root):
    t = _repo(spark, tmp_root, index_cols="k")
    t.extend(_seed(spark))
    t.rename_column("v", "val")
    t.rename_column("val", "value")
    t.replace_records(
        spark.createDataFrame([Row(k=2, value=99.0, s="upd")])
    )
    rows = {r.k: (r.value, r.s) for r in t.get_full_df().collect()}
    assert rows[2] == (99.0, "upd")
    assert rows[1] == (1.0, "s1")


def test_ddl_refuses_structural_and_bad_args(spark, tmp_root):
    t = _repo(spark, tmp_root, group_cols="s", index_cols="k")
    t.extend(_seed(spark))
    with pytest.raises(ValueError):
        t.rename_column("s", "s2")  # partition col
    with pytest.raises(ValueError):
        t.drop_column("k")  # key col
    with pytest.raises(KeyError):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError):
        t.add_column("V", "double")  # case-colliding with v
    with pytest.raises(ValueError):
        t.drop_column("v") or t.drop_column("k")  # v ok; then k refused
    plain = TableRepo(tmp_root + "/plain", spark=spark)
    plain.extend(_seed(spark))
    with pytest.raises(TypeError):
        plain.rename_column("v", "x")  # manifest mode only


def test_time_travel_reads_with_snapshot_schema(spark, tmp_root):
    """Round 6 changed this contract to the Iceberg snapshot↔schema
    binding: a version published BEFORE a rename reads back with its
    own epoch's name, not the current one (tests/test_time_travel_schema
    covers the full matrix; here we pin the DDL-suite view of it)."""
    t = _repo(spark, tmp_root)
    t.extend(_seed(spark))
    v1 = t.versions()[-1]
    t.rename_column("v", "value")
    t.extend(_seed(spark, base=10).withColumnRenamed("v", "value"))
    old = t.get_full_df(version=v1)
    assert "v" in old.columns and "value" not in old.columns
    assert old.count() == 4
    assert {r.v for r in old.collect()} == {0.0, 1.0, 2.0, 3.0}
    # the CURRENT read speaks the current epoch over both commits
    assert {r.value for r in t.get_full_df().collect()} == {
        0.0, 1.0, 2.0, 3.0, 10.0, 11.0, 12.0, 13.0,
    }


def test_clone_and_branch_carry_epochs(spark, tmp_root):
    t = _repo(spark, tmp_root)
    t.extend(_seed(spark))
    t.rename_column("v", "value")
    c = t.clone_to(tmp_root + "/clone")
    assert {r.k for r in c.get_full_df().where(F.col("value") >= 0).collect()} == {0, 1, 2, 3}
    b = t.create_branch("dev")
    assert "value" in b.get_full_df().columns
    # DDL on a branch refuses to merge back
    b.add_column("extra", "int")
    with pytest.raises(RuntimeError, match="schema logs"):
        t.merge_branch("dev")


def test_concurrent_ddl_serializes(spark, tmp_root):
    t = _repo(spark, tmp_root)
    t.extend(_seed(spark))
    errs, done = [], []

    def run(i):
        try:
            h = TableRepo(tmp_root + "/t", spark=spark, commit_mode="manifest")
            h.add_column(f"c{i}", "int")
            done.append(i)
        except Exception as e:  # CAS losers retry internally; none should fail
            errs.append(e)

    ts = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    [x.start() for x in ts]
    [x.join() for x in ts]
    assert not errs and len(done) == 4
    names = {f["name"] for f in t.schema_log()[-1]["fields"]}
    assert {"c0", "c1", "c2", "c3"} <= names
    ids = [f["id"] for e in t.schema_log() for f in e["fields"]]
    assert len(set(ids)) <= max(ids)  # ids stable, never clash per name


def test_widening_syncs_into_log(spark, tmp_root):
    t = _repo(spark, tmp_root, allow_schema_extension=True)
    t.extend(_seed(spark))
    t.rename_column("v", "value")  # bootstraps the log
    t.extend(
        _seed(spark, base=20)
        .withColumnRenamed("v", "value")
        .withColumn("extra", F.lit(1))
    )
    assert "extra" in t.get_full_df().columns
    last = t.schema_log()[-1]
    assert any(f["name"] == "extra" for f in last["fields"])


def test_dv_delete_survives_rename(spark, tmp_root):
    t = _repo(spark, tmp_root, index_cols="k")
    t.extend(_seed(spark))
    t.delete_records_dv(spark.createDataFrame([Row(k=1)]))
    t.rename_column("v", "value")
    rows = {r.k for r in t.get_full_df().collect()}
    assert rows == {0, 2, 3}


def test_add_column_initial_default(spark, tmp_root):
    t = _repo(spark, tmp_root)
    t.extend(_seed(spark))
    t.add_column("score", "double", default=1.5)
    t.add_column("tag", "string", default="legacy")
    t.extend(
        _seed(spark, base=30)
        .withColumn("score", F.lit(9.9))
        .withColumn("tag", F.lit("new"))
    )
    rows = {r.k: (r.score, r.tag) for r in t.get_full_df().collect()}
    # pre-DDL rows surface the initial default, post-DDL rows their value
    assert all(rows[i] == (1.5, "legacy") for i in range(4))
    assert rows[30] == (9.9, "new")
    # a post-DDL write that OMITS the column stores a real null — the
    # default describes history, it does not shadow new data
    t.extend(_seed(spark, base=60))
    rows = {r.k: (r.score, r.tag) for r in t.get_full_df().collect()}
    assert rows[60] == (None, None)
    with pytest.raises(TypeError):
        t.add_column("bad", "array<int>", default=[1, 2])


def test_stats_skipping_prunes_across_rename(spark, tmp_root):
    t = _repo(spark, tmp_root, stats_cols="v")
    t.extend(
        spark.range(0, 1000)
        .select(
            F.col("id").alias("k"),
            F.col("id").cast("double").alias("v"),
            F.lit("x").alias("s"),
        )
        .repartitionByRange(8, "k")
    )
    k0, tot0 = t.skip_plan([("v", ">=", 990.0)])
    assert 0 < k0 < tot0  # range-clustered stats prune pre-rename
    t.rename_column("v", "value")
    # pre-rename files' stats are keyed by the OLD name — the id-mapped
    # translation keeps pruning working under the NEW name
    k1, tot1 = t.skip_plan([("value", ">=", 990.0)])
    assert (k1, tot1) == (k0, tot0)
    got = t.get_full_df_skipping([("value", ">=", 990.0)])
    assert got.count() == 10 and "value" in got.columns


def test_purge_invalidates_epoch_cache(spark, tmp_root):
    t = _repo(spark, tmp_root)
    t.extend(_seed(spark))
    t.rename_column("v", "value")
    assert len(t.schema_log()) == 2
    t.purge()
    # recreate at the SAME root with a different shape — the new table
    # must not inherit the purged table's cached epochs
    t2 = _repo(spark, tmp_root)
    t2.extend(spark.createDataFrame([Row(a=1, b="x")]))
    assert t2.schema_log() == []
    t2.rename_column("b", "bb")
    log = t2.schema_log()
    assert [e["v"] for e in log] == [1, 2]
    assert {f["name"] for f in log[-1]["fields"]} == {"a", "bb"}
    assert {r.bb for r in t2.get_full_df().collect()} == {"x"}


# ---------------------------------------------------------------- property

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# ops: ("add", default_or_None) | ("rename",) | ("drop",) | ("write",)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("add"), st.one_of(st.none(), st.integers(-5, 5))),
        st.tuples(st.just("rename")),
        st.tuples(st.just("drop")),
        st.tuples(st.just("write")),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_ddl_sequences_match_model(spark, tmp_path_factory, ops):
    """Any interleaving of add/rename/drop and writes reads back exactly
    what a pure-Python field-id model predicts: a row surfaces, for each
    CURRENT field, the value it was written with under that field's id —
    or the field's initial default (None if none) when it predates the
    column. The single invariant behind every mapping rule."""
    root = str(tmp_path_factory.mktemp("ddlprop")) + "/t"
    t = TableRepo(root, commit_mode="manifest", single_writer=True, spark=spark)

    next_id = [2]
    fields = [{"id": 1, "name": "c1", "default": None}]  # current schema (model)
    next_name = [2]
    written = []  # (values_by_field_id: dict)
    k = [0]

    def do_write():
        row = {f["id"]: k[0] * 100 + f["id"] for f in fields}
        df = spark.createDataFrame(
            [tuple([k[0]] + [row[f["id"]] for f in fields])],
            "k long, " + ", ".join(f"{f['name']} long" for f in fields),
        )
        t.extend(df)
        written.append(row)
        k[0] += 1

    do_write()  # freeze the canonical schema before any DDL
    for op in ops:
        if op[0] == "add":
            name = f"c{next_name[0]}"
            next_name[0] += 1
            t.add_column(name, "long", default=op[1])
            fields.append({"id": next_id[0], "name": name, "default": op[1]})
            next_id[0] += 1
        elif op[0] == "rename" and fields:
            i = len(fields) // 2
            new = f"c{next_name[0]}"
            next_name[0] += 1
            t.rename_column(fields[i]["name"], new)
            fields[i] = {**fields[i], "name": new}
        elif op[0] == "drop" and len(fields) > 1:
            i = len(fields) - 1
            t.drop_column(fields[i]["name"])
            fields.pop(i)
        elif op[0] == "write":
            do_write()

    got = {r["k"]: r.asDict() for r in t.get_full_df().collect()}
    assert len(got) == len(written)
    for kk, row in enumerate(written):
        for f in fields:
            exp = row.get(f["id"], f["default"])
            assert got[kk][f["name"]] == exp, (
                f"k={kk} field {f} expected {exp} got {got[kk][f['name']]}"
            )


def test_ddl_races_concurrent_writers(spark, tmp_root):
    """Writers extending WHILE columns are renamed/added: every commit
    stamps the epoch its aligned column set actually matched, so the
    read maps each batch correctly whichever side of a rename it landed
    on. No writer and no DDL may fail, and no value may be lost or
    null out."""
    t = _repo(spark, tmp_root, single_writer=False)
    t.extend(_seed(spark, n=2))  # freeze canonical (k, v, s)
    stop, errs = [], []

    def writer(base):
        try:
            h = TableRepo(tmp_root + "/t", spark=spark, commit_mode="manifest")
            for j in range(4):
                cols = {f["name"] for f in (h.schema_log() or [{}])[-1].get("fields", [])}
                df = _seed(spark, n=1, base=base + j)
                if "value" in cols:
                    df = df.withColumnRenamed("v", "value")
                h.extend(df)
        except Exception as e:
            errs.append(("writer", e))

    def ddler():
        try:
            h = TableRepo(tmp_root + "/t", spark=spark, commit_mode="manifest")
            h.rename_column("v", "value")
            h.add_column("extra", "long", default=7)
        except Exception as e:
            errs.append(("ddl", e))

    ws = [threading.Thread(target=writer, args=(100 * (i + 1),)) for i in range(3)]
    d = threading.Thread(target=ddler)
    [x.start() for x in ws]
    d.start()
    [x.join() for x in ws + [d]]
    assert not errs, errs
    df = t.get_full_df()
    assert {"value", "extra"} <= set(df.columns)
    rows = {r.k: (r.value, r.extra) for r in df.collect()}
    assert len(rows) == 2 + 12
    # every row's value survived the rename with its written number
    for k, (val, _extra) in rows.items():
        assert val == float(k), (k, val)
    # extras are either the written value (post-add epochs write nulls —
    # _seed has no extra column) or the initial default for pre-add rows
    assert all(e in (None, 7) for _, e in rows.values())


@pytest.mark.parametrize("partitioned", [False, True])
def test_stream_changes_maps_schema_epochs(spark, tmp_root, tmp_path, partitioned):
    """The CDF stream must map schema epochs like the batch read path:
    pre-rename files stream the renamed column's VALUES (not nulls),
    predating columns surface their initial default, and post-DDL files
    stream physical values — both reader flavors."""
    t = _repo(spark, tmp_root, index_cols="k")
    t.extend(_seed(spark))  # epoch-1 files (column 'v')
    t.rename_column("v", "value")
    t.add_column("w", "long", default=5)
    t.extend(
        _seed(spark, base=10)
        .withColumnRenamed("v", "value")
        .withColumn("w", F.lit(9).cast("long"))
    )
    out = str(tmp_path / f"o{int(partitioned)}")
    ck = str(tmp_path / f"c{int(partitioned)}")
    q = (
        t.stream_changes(partitioned=partitioned)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.k: (r.value, r.w)
        for r in spark.read.parquet(out).where("_change_type = 'insert'").collect()
    }
    assert got[1] == (1.0, 5), got  # pre-rename file: id-mapped + default
    assert got[11] == (11.0, 9), got  # post-DDL file: physical values
    assert len(got) == 8


def test_cdc_sync_converges_after_rename(spark, tmp_root, tmp_path):
    """sync_from over a renamed source replicates VALUES, not nulls —
    the replica equals the source's batch read."""
    src = _repo(spark, tmp_root, index_cols="k")
    src.extend(_seed(spark))
    src.rename_column("v", "value")
    src.extend(_seed(spark, base=10).withColumnRenamed("v", "value"))
    src.delete_records_dv(spark.createDataFrame([Row(k=2)]))
    repl = TableRepo(
        tmp_root + "/repl", index_cols="k", commit_mode="manifest", spark=spark
    )
    repl.sync_from(src, checkpoint=str(tmp_path / "ck"))
    want = sorted(tuple(r) for r in src.get_full_df().collect())
    got = sorted(tuple(r) for r in repl.get_full_df().collect())
    assert got == want and len(got) == 7


def test_write_racing_type_widen_stamps_written_epoch(spark, tmp_root, monkeypatch):
    """A batch aligned under the pre-widen epoch whose commit lands
    after a concurrent alter_column_type must stamp the epoch whose
    TYPES it physically wrote — otherwise readers open its int32 files
    with a bigint schema and fail forever."""
    t = _repo(spark, tmp_root)
    t.extend(spark.createDataFrame([Row(k=1, n=7)], "k long, n int"))
    h = TableRepo(
        tmp_root + "/t", spark=spark, commit_mode="manifest", single_writer=True
    )
    orig = TableRepo._apply_constraints
    fired = []

    def hook(self, df):
        if not fired:  # inject the DDL between this write's align and stage
            fired.append(1)
            t.alter_column_type("n", "bigint")
        return orig(self, df)

    monkeypatch.setattr(TableRepo, "_apply_constraints", hook)
    h.extend(spark.createDataFrame([Row(k=2, n=8)], "k long, n int"))
    df = t.get_full_df()
    assert dict(df.dtypes)["n"] == "bigint"
    assert {(r.k, r.n) for r in df.collect()} == {(1, 7), (2, 8)}


def test_pruned_stream_subscription_survives_rename(spark, tmp_root, tmp_path):
    """A stats-pruned stream subscription keeps pruning after a rename:
    the predicate's current name translates back to each commit's epoch
    name before the min/max probe."""
    t = _repo(spark, tmp_root, index_cols="k", stats_cols="v")
    t.extend(
        spark.range(0, 400).select(
            F.col("id").alias("k"),
            F.col("id").cast("double").alias("v"),
            F.lit("x").alias("s"),
        ).repartitionByRange(8, "k")
    )
    t.rename_column("v", "value")
    out, ck = str(tmp_path / "o"), str(tmp_path / "c")
    q = (
        t.stream_manifest(predicates=[("value", ">=", 390.0)])
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    ks = {r.k for r in got.collect()}
    # pruning is FILE-level: the matching rows must all arrive (with
    # their renamed column's VALUES), and whole non-matching ranges
    # must have been skipped (fewer than all 400 rows streamed)
    assert {k for k in range(390, 400)} <= ks
    assert len(ks) < 400
    vals = {r.k: r.value for r in got.where(F.col("k") >= 390).collect()}
    assert vals == {k: float(k) for k in range(390, 400)}


def test_compact_retires_epoch_mapping_debt(spark, tmp_root):
    """Normal maintenance pays off DDL debt: compaction reads the
    current-schema view and rewrites, so every surviving commit is
    stamped with the CURRENT epoch and reads stop paying the per-commit
    id mapping entirely."""
    from parquetranger_spark.sources.manifest import load_manifest

    t = _repo(spark, tmp_root)
    t.extend(_seed(spark))
    t.rename_column("v", "value")
    t.add_column("w", "long", default=4)
    t.extend(_seed(spark, base=10).withColumnRenamed("v", "value"))
    t.compact()
    cur_v = t.schema_log()[-1]["v"]
    mf = load_manifest(t._fs(), t.main_path)
    data = [c for c in mf["commits"] if c.get("kind") != "dv" and c["files"]]
    assert data and all(c.get("schema_v") == cur_v for c in data)
    rows = {r.k: (r.value, r.w) for r in t.get_full_df().collect()}
    # the mapped values (rename + initial default) are now PHYSICAL
    assert rows[1] == (1.0, 4) and rows[11] == (11.0, None)
