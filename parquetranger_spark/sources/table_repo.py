"""TableRepo — Spark-native partitioned-parquet table management.

Re-expresses the reference's storage surface
(/root/reference/parquetranger/core.py:47-89, class ``TableRepo``) on top of
Spark's own partitioned-parquet machinery. The mapping (SURVEY.md §2.1):

- ``extend``            → ``write.mode("append").partitionBy(G)`` with
                          ``maxRecordsPerFile`` (reference core.py:91-112)
- ``replace_records``   → anti-join upsert + dynamic partition overwrite of
                          only the touched partitions (core.py:114-133)
- ``replace_groups``    → dynamic partition overwrite (core.py:153-155)
- ``replace_all``       → static overwrite (core.py:157-160)
- ``purge``             → recursive delete (core.py:162-167)
- ``get_full_df``       → ``spark.read.parquet(root)`` (core.py:169-175)
- ``get_partition_df``  → partition-pruned read (core.py:177-194)
- ``map_partitions``    → ``groupBy(...).applyInPandas`` (core.py:138-151)
- env switching         → parameterized root parents (core.py:196-201,245-250)
- hash partitioning     → computed md5-mod-n partition column (core.py:25-44)

Deliberate divergences from the reference, all value-preserving:

- Directory layout is hive-style ``col=value`` (Spark native) instead of
  bare-value dirs; partition columns are never duplicated inside data files
  (the reference's ``drop_group_cols=True`` behavior is the only one Spark
  supports natively — read-back output is identical either way).
- No per-path locks or last-file top-up (core.py:307-321): Spark files are
  immutable and the output-commit protocol replaces locking. File *counts*
  may differ from the reference; row sets never do.
- User metadata goes to a JSON sidecar, not pickled parquet footers
  (core.py:535-536) — safe and engine-portable.
- Row identity is explicit ``index_cols`` (the pandas index reified as
  columns, SURVEY §7.3.1); "first" in keep-first dedup is defined by the
  incoming frame's (partition, row) order via a monotonic sequence column.

Scale notes (the 100 TB story):

- Appends and overwrites are single distributed write jobs; the only
  shuffle a write performs is the hash repartition by partition keys that
  ``partitionBy`` implies, and small-file pressure is controlled by
  ``maxRecordsPerFile`` + AQE coalescing.
- Upserts never rewrite the table: touched partitions are located with a
  broadcast semi-join on the (low-cardinality) partition keys, read back
  partition-pruned, patched, and rewritten under
  ``partitionOverwriteMode=dynamic``. Cost is O(touched partitions), not
  O(table).
- Reads are plain ``spark.read.parquet`` → vectorized scan, predicate
  pushdown, partition pruning, column pruning all apply untouched.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import HashPartitioner
from ..plans.schema import (
    TableMeta,
    align_to_schema,
    load_meta,
    save_meta,
    widen_schema,
)
from ..session import active_spark
from . import fs as _fsmod
from .fs import fs_for, join_path, path_parts

_SEQ_COL = "__pqr_seq"
_DV_POS = "__pqr_dv_pos"


def _to_epoch(ts) -> float:
    """Epoch seconds from any reasonable AS-OF spelling: a number passes
    through; datetime/ISO-8601 strings convert, with NAIVE values read as
    UTC (the lakehouse AS OF convention — a table shared across regions
    cannot mean "the driver's local zone")."""
    import datetime as _dt

    if isinstance(ts, (int, float)) and not isinstance(ts, bool):
        return float(ts)
    if isinstance(ts, str):
        ts = _dt.datetime.fromisoformat(ts)
    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return ts.timestamp()
    raise TypeError(f"cannot interpret {ts!r} as a timestamp")


def _cast_partition_strings(vals: list[str], dtype) -> list | None:
    """Hive-path partition strings → typed Python values matching what a
    scan's distinct() would return for that column type; None for types
    the path encoding cannot round-trip losslessly (caller scans)."""
    import datetime as _dt

    if dtype is None or isinstance(dtype, T.StringType):
        return list(vals)
    try:
        if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return [int(v) for v in vals]
        if isinstance(dtype, (T.FloatType, T.DoubleType)):
            return [float(v) for v in vals]
        if isinstance(dtype, T.BooleanType):
            return [v.lower() == "true" for v in vals]
        if isinstance(dtype, T.DateType):
            return [_dt.date.fromisoformat(v) for v in vals]
        if isinstance(dtype, T.DecimalType):
            from decimal import Decimal

            return [Decimal(v) for v in vals]
    except (ValueError, ArithmeticError):
        return None
    return None


class ConcurrentWriteError(RuntimeError):
    """A read-modify-write publish detected a commit that landed since
    its read snapshot and would be silently erased/resurrected by the
    rewrite. Rerun the operation against the current table state."""


class TableRepo:
    """A logical table = one root directory of partitioned parquet.

    Parameters mirror the reference constructor (core.py:47-89):

    - ``root_path``: table root; its basename is the table name.
    - ``group_cols``: partition columns (str or list), or a
      :class:`HashPartitioner` for md5-bucket partitioning.
    - ``max_records``: max rows per data file (0 = unbounded) — the
      reference's chunking knob, mapped to ``maxRecordsPerFile``.
    - ``index_cols``: explicit key columns standing in for the pandas
      index; required for ``replace_records``.
    - ``env_parents``: name → parent dir; ``set_env`` relocates the table
      root among them (reference core.py:196-201).
    - ``fixed_schema``: pin the canonical schema up front (reference
      ``fixed_metadata``, core.py:67).
    - ``allow_schema_extension``: widen the canonical schema on new
      columns and rewrite old files (reference
      ``allow_metadata_extension``, core.py:405-421).
    - ``single_writer``: declare that only one job ever appends to this
      table at a time; appends then use Spark's plain committer directly
      (one write job, no staging dir or rename fan-out). Leave False when
      concurrent appends are possible — see ``_two_phase_append``.
    - ``commit_mode``: ``"files"`` (default — visibility by directory
      layout, renames on append) or ``"manifest"`` (visibility by
      versioned manifest CAS: atomic commits on object stores, snapshot
      isolation, ``get_full_df(version=)`` time travel, no renames ever
      — see sources/manifest.py).
    """

    def __init__(
        self,
        root_path: str,
        group_cols: str | list[str] | HashPartitioner | None = None,
        max_records: int = 0,
        index_cols: str | list[str] | None = None,
        env_parents: dict[str, str] | None = None,
        mkdirs: bool = True,
        extra_metadata: dict[str, Any] | None = None,
        fixed_schema: T.StructType | None = None,
        allow_schema_extension: bool = False,
        cluster_by: str | list[str] | None = None,
        cluster_algo: str = "sort",
        single_writer: bool = False,
        commit_mode: str = "files",
        compression: str | None = None,
        stats_cols: str | list[str] | None = None,
        constraints: dict[str, str] | None = None,
        constraint_mode: str = "fail",
        generated_cols: dict[str, str] | None = None,
        bloom_cols: str | list[str] | None = None,
        manifest_inline_files_max: int = 2000,
        governed: bool = False,
        governed_as: str | None = None,
        spark: SparkSession | None = None,
    ):
        root_path = str(root_path)
        self.name = _fsmod.basename(root_path)
        self.env_parents = {k: str(v) for k, v in (env_parents or {}).items()}
        self._default_parent = _fsmod.parent_dir(root_path)
        self._current_parent = self._default_parent

        self.partitioner: HashPartitioner | None = None
        if isinstance(group_cols, HashPartitioner):
            self.partitioner = group_cols
            self.group_cols = [group_cols.bucket_col]
        elif isinstance(group_cols, str):
            self.group_cols = [group_cols]
        else:
            self.group_cols = list(group_cols or [])

        self.index_cols = [index_cols] if isinstance(index_cols, str) else list(index_cols or [])
        self.cluster_by = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by or [])
        if cluster_algo not in ("sort", "zorder"):
            raise ValueError("cluster_algo must be 'sort' or 'zorder'")
        self.cluster_algo = cluster_algo
        self.max_records = int(max_records)
        self.extra_metadata = dict(extra_metadata or {})
        self.fixed_schema = fixed_schema
        self.allow_schema_extension = allow_schema_extension
        self.single_writer = bool(single_writer)
        if commit_mode not in ("files", "manifest"):
            raise ValueError("commit_mode must be 'files' or 'manifest'")
        self.commit_mode = commit_mode
        # parquet codec for every file this repo writes (None = session
        # default, snappy). At 100 TB the write-once-read-many tables want
        # zstd: ~30-40% smaller scans for a one-time encode cost; hot
        # append targets can stay on snappy per table.
        self.compression = compression
        # columns whose per-FILE [min, max] are recorded in the manifest at
        # commit time, enabling driver-side file skipping on read
        # (get_full_df_skipping) — the Delta/Iceberg data-skipping shape
        self.stats_cols = [stats_cols] if isinstance(stats_cols, str) else list(stats_cols or [])
        if self.stats_cols and commit_mode != "manifest":
            raise ValueError("stats_cols requires commit_mode='manifest' (stats live in the manifest)")
        # columns given a per-FILE Bloom filter in the manifest at commit
        # time: point predicates (== / in) on UNCLUSTERED columns prune
        # files min/max ranges can't (the Delta bloom-index shape);
        # string/integral columns only — position hashing is over the
        # canonical string form, identical in Spark SQL and Python
        self.bloom_cols = [bloom_cols] if isinstance(bloom_cols, str) else list(bloom_cols or [])
        # commits listing more files than this spill their file list to an
        # immutable side object (_pqrs_manifest/lists/) and the version
        # JSON carries only the ref — the manifest-of-manifests tier that
        # keeps the CAS object KB-sized on tables with millions of files
        self.manifest_inline_files_max = int(manifest_inline_files_max)
        if self.bloom_cols and commit_mode != "manifest":
            raise ValueError("bloom_cols requires commit_mode='manifest' (blooms live in the manifest)")
        # named CHECK constraints (SQL boolean expressions over the batch's
        # columns) enforced on EVERY write path — the Delta-style quality
        # gate. mode 'fail': a violating batch is rejected whole before any
        # file lands; mode 'drop' (the DLT expect_or_drop shape): violating
        # rows are filtered out and per-constraint drop counts land in
        # ``last_constraint_drops`` for the caller's quality telemetry
        self.constraints = dict(constraints or {})
        if constraint_mode not in ("fail", "drop"):
            raise ValueError("constraint_mode must be 'fail' or 'drop'")
        self.constraint_mode = constraint_mode
        self.last_constraint_drops: dict[str, int] = {}
        # GENERATED columns (the Delta GENERATED ALWAYS AS shape): column
        # -> SQL expression over the row's other columns, computed on
        # every write path when the writer omits the column and VALIDATED
        # (whole-batch reject on any mismatch) when the writer provides
        # it — so a derived partition column (day = date(ts)) can never
        # drift from its source. Persisted with the table config.
        self.generated_cols = dict(generated_cols or {})
        # governed=True makes this a CONSUMER handle: every read surface
        # applies the table's persisted governance policy (row filter +
        # column masks), and every mutation is refused — a policy a
        # consumer could sidestep by method choice would not be a policy.
        # The flag is a HANDLE property (never persisted): owners hold
        # ungoverned handles, consumers are given governed ones
        # (`TableRepo.open(root, governed=True)`). ``governed_as`` binds
        # the handle to a PRINCIPAL: the policy resolved at read time is
        # the role's own (set_policy(role=...)), falling back to the
        # table default; a role the role-governed table never granted
        # fails CLOSED (see _policy). Implies governed.
        self.governed_as = governed_as
        self.governed = bool(governed) or governed_as is not None
        self._spark = spark
        # content-keyed memo of folded deletion-vector frames (see
        # _dv_frame) — handle-local, session-lifetime, never persisted
        self._dv_memo: dict = {}
        if mkdirs and not self.governed:
            self.mkdirs()
        if self.commit_mode == "manifest":
            # the manifest's partition spec is authoritative for an evolved
            # table: a reopened instance must write under the CURRENT spec,
            # not whatever the constructor was handed
            spec = self._manifest_spec()
            if spec is not None and spec != self.group_cols:
                self.group_cols = spec

    def _manifest_spec(self) -> list[str] | None:
        from .manifest import load_manifest

        try:
            mf = load_manifest(self._fs(), self.main_path)
        except Exception:
            return None
        return None if mf is None else mf.get("spec")

    def _assert_uniform_spec(self, commits: list[dict]) -> None:
        """Partition-value-targeted operations (dynamic overwrite, keyed
        upsert/delete read-backs) are only sound when every live commit
        was written under the CURRENT partition spec — an old-spec commit
        cannot be pruned (or partition-filtered) by new-spec values.
        Entries without a ``spec`` key predate evolution support and were
        necessarily written under the table's only-ever spec."""
        for c in commits:
            if c.get("spec", self.group_cols) != self.group_cols:
                raise RuntimeError(
                    f"table {self.name!r} holds commits under partition spec "
                    f"{c.get('spec')} != current {self.group_cols}; rewrite "
                    "first (evolve_partitioning(..., rewrite=True), "
                    "replace_all, or compact after a rewrite) before "
                    "partition-targeted writes"
                )

    def evolve_partitioning(
        self, group_cols: str | list[str] | None, rewrite: bool = False
    ) -> None:
        """Change the table's partition spec (manifest mode only) — the
        lakehouse partition-evolution feature: data layout requirements
        change as a table grows (e.g. date → (date, tenant) once one
        partition gets hot) and a 100 TB table cannot be rewritten just
        to change future layout.

        ``rewrite=False`` (lazy, O(1)): future commits write under the
        new spec; existing commits stay as-is. Reads remain correct —
        every commit anchors its own hive-layout discovery, the scans
        union with missing columns as nulls, and partition pruning still
        applies per commit where the column exists. Partition-VALUE-
        targeted writes (replace_groups / keyed upsert / delete /
        compact) are refused while specs are mixed (see
        ``_assert_uniform_spec``); appends and full overwrites flow.

        ``rewrite=True`` (eager, O(table)): one static overwrite lays the
        whole table out under the new spec immediately — the explicit
        maintenance job, same posture as ``rewrite_to_canonical``."""
        self._assert_ungoverned("evolve_partitioning")
        if self.commit_mode != "manifest":
            raise TypeError("evolve_partitioning requires commit_mode='manifest'")
        from .manifest import load_manifest, try_commit

        new_spec = (
            [group_cols] if isinstance(group_cols, str) else list(group_cols or [])
        )
        if rewrite:
            df = self.get_full_df().localCheckpoint(eager=True)
            # _prepare drops rows whose group key is NULL (the write-path
            # convention for NEW data) — but this rewrite feeds EXISTING
            # rows back through it, and silently losing previously-visible
            # data is never acceptable. Refuse loudly; the caller decides
            # (fill the column, or delete the rows explicitly).
            null_pred = None
            for c in new_spec:
                if c in df.columns:
                    p = F.col(c).isNull()
                    null_pred = p if null_pred is None else null_pred | p
            if null_pred is not None:
                n_null = df.where(null_pred).count()
                if n_null:
                    raise ValueError(
                        f"evolve_partitioning(rewrite=True): {n_null} existing "
                        f"rows have NULL in the new partition columns "
                        f"{new_spec} and would be silently dropped by the "
                        "rewrite; fill or delete them first"
                    )
            self.group_cols = new_spec
            self._write(self._prepare(df), mode="overwrite", dynamic=False)
            return
        fs = self._fs()
        old_spec = list(self.group_cols)
        self.group_cols = new_spec
        while True:
            cur = load_manifest(fs, self.main_path)
            commits = [
                {**c, "spec": c.get("spec", old_spec)}
                for c in (cur["commits"] if cur else [])
            ]
            nxt = {
                "version": (cur["version"] if cur else 0) + 1,
                "commits": commits,
                "spec": new_spec,
                "op": "evolve-partitioning",
            }
            if try_commit(fs, self.main_path, nxt, prev_ts=(cur or {}).get("ts", 0.0)):
                return

    # ------------------------------------------------------------------ paths

    @property
    def main_path(self) -> str:
        return join_path(self._current_parent, self.name)

    def _fs(self):
        """Filesystem for the CURRENT root (env switching can relocate the
        table between filesystems, so this resolves per call): bare paths →
        local os/glob/shutil; URI roots (s3a://, hdfs://, file://) → the
        Hadoop FileSystem client from the session's JVM, sharing Spark's own
        Hadoop conf/credentials. See sources/fs.py."""
        return fs_for(self.main_path, spark=self._spark)

    @property
    def paths(self) -> list[str]:
        """All data files, sorted (reference ``paths``, core.py:261-265).
        In manifest mode the manifest IS the file index — no directory
        listing, and files awaiting vacuum never surface. Refused on a
        governed handle with an active policy: hive path components
        disclose raw partition values and the existence of rows the
        policy hides (same perimeter as stats/files_df)."""
        self._refuse_leaky_metadata("paths")
        return self._live_paths()

    def _live_paths(self) -> list[str]:
        if self.commit_mode == "manifest":
            from .manifest import effective_commits, live_files, load_manifest

            mf = load_manifest(self._fs(), self.main_path)
            if mf is not None:
                mf = {**mf, "commits": effective_commits(mf["commits"], self.group_cols)}
            return live_files(mf, self.main_path)
        return self._fs().list_files(self.main_path, ".parquet")

    @property
    def vc_path(self) -> str:
        """Version-controllable path (reference ``vc_path``, core.py:253-255);
        always the table root here — there is no single-file special case."""
        return self.main_path

    @property
    def n_files(self) -> int:
        # a bare count discloses no values — served even under a policy
        return len(self._live_paths())

    def stats(self) -> DataFrame:
        """Per-partition physical statistics as a DataFrame — rows, file
        count, bytes, and rows-per-file — computed DISTRIBUTED from the
        scan's hidden ``_metadata`` column (file path + size ride along
        with each row; no driver-side footer walking, so this works
        unchanged on a 100 TB table). This is the observability surface
        compaction decisions read: partitions with many small files are
        ``compact()`` candidates."""
        self._refuse_leaky_metadata("stats")

        def proj(s: DataFrame) -> DataFrame:
            return s.select(
                *self.group_cols,
                F.col("_metadata.file_path").alias("__f"),
                F.col("_metadata.file_size").alias("__sz"),
            )

        if not self._live_paths():
            # EITHER mode: an empty table's scan is an in-memory relation
            # with no _metadata pseudo-column — proj would raise
            # UNRESOLVED_COLUMN; surface an empty stats frame instead so
            # maintenance jobs see "nothing to do", not a crash. Built
            # from scratch (not the empty scan): a never-written table
            # has no sidecar schema to resolve the group columns against.
            meta = load_meta(self.main_path, spark=self._spark)
            gtypes = {}
            if meta and meta.schema:
                gtypes = {f.name: f.dataType for f in meta.schema.fields}
            df = self._session().createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField(c, gtypes.get(c, T.StringType()))
                        for c in self.group_cols
                    ]
                    + [
                        T.StructField("__f", T.StringType()),
                        T.StructField("__sz", T.LongType()),
                    ]
                ),
            )
        elif self.commit_mode == "manifest":
            # _metadata must be selected INSIDE each per-commit scan:
            # Spark does not propagate metadata columns through Union,
            # so projecting after the multi-commit unionByName raises
            # UNRESOLVED_COLUMN
            df = self._manifest_df(None, project=proj)
        else:
            df = proj(self.get_full_df())
        per_file = df.groupBy(*(self.group_cols + ["__f"])).agg(
            F.count(F.lit(1)).alias("__rows"), F.first("__sz").alias("__bytes")
        )
        return per_file.groupBy(*self.group_cols).agg(
            F.sum("__rows").alias("n_rows"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum("__bytes").alias("n_bytes"),
            (F.sum("__rows") / F.count(F.lit(1))).alias("rows_per_file"),
        )

    @property
    def dfs(self):
        """Per-data-file DataFrames (reference ``dfs``, core.py:271-273).
        Partition-column values are restored from the directory names via
        ``basePath``, matching the reference's ``__gb_dict`` footer
        rematerialization (core.py:216-223)."""
        spark = self._session()
        pol = self._policy() if self.governed else {}
        for p in self._live_paths():
            df = spark.read.option("basePath", self._scan_base(p)).parquet(p)
            yield self._apply_policy(df, pol) if self.governed else df

    def _scan_base(self, path: str) -> str:
        """The basePath partition-column discovery anchors on: the table
        root, except in manifest mode where hive dirs live under each
        commit's own ``_pqrs_data/<uuid>`` directory. The anchor is cut
        from the PATH itself, not rebuilt under this repo's root — a
        shallow clone's commits reference data dirs under the SOURCE
        table's root, and a basePath that is not an ancestor of the file
        path fails the scan."""
        if self.commit_mode == "manifest":
            from .manifest import DATA_DIR

            token = "/" + DATA_DIR + "/"
            i = path.find(token)
            if i >= 0:
                rest = path[i + len(token):]
                return path[: i + len(token)] + rest.split("/", 1)[0]
        return self.main_path

    def get_partition_paths(self, partition_col: str) -> Iterable[tuple[str, list[str]]]:
        """Group the data files by one partition column's value — yields
        ``(value, paths)`` pairs for every value, matching the reference
        signature and return shape (``get_partition_paths``,
        core.py:177-183 returns an itertools.groupby over sorted paths).
        Values come from the hive-style ``col=value`` path component."""
        self._refuse_leaky_metadata("get_partition_paths")
        if partition_col not in self.group_cols:
            raise TypeError(f"{partition_col!r} is not a partition column of {self.name}")
        prefix = f"{partition_col}="

        def val_of(p: str) -> str:
            for part in path_parts(p):
                if part.startswith(prefix):
                    return part[len(prefix):]
            return ""

        from itertools import groupby

        return (
            (v, list(ps)) for v, ps in groupby(sorted(self._live_paths(), key=val_of), key=val_of)
        )

    def paths_for_partition(self, value: Any, partition_col: str | None = None) -> list[str]:
        """Data files under ONE partition value (the inverse lookup of
        :meth:`get_partition_paths`). Raises if the column exists but the
        value has no files — a silent ``[]`` hides typos."""
        self._refuse_leaky_metadata("paths_for_partition")
        pc = partition_col or (self.group_cols[0] if self.group_cols else None)
        if pc is None:
            raise TypeError("not a grouped table")
        from .manifest import hive_value

        needle = f"{pc}={hive_value(value)}"
        out = [p for p in self._live_paths() if needle in path_parts(p)]
        if not out and self._live_paths():
            raise KeyError(f"no files for partition {needle}")
        return out

    @property
    def full_metadata(self) -> dict[str, Any]:
        meta = load_meta(self.main_path, spark=self._spark)
        return dict(meta.extra_metadata) if meta else dict(self.extra_metadata)

    def mkdirs(self, force: bool = True) -> None:
        self._fs().mkdirs(self.main_path)

    # ------------------------------------------------------------------- envs

    def set_env(self, name: str) -> None:
        self._current_parent = self.env_parents[name]

    def set_env_to_default(self) -> None:
        self._current_parent = self._default_parent

    @contextmanager
    def env_ctx(self, name: str):
        prev = self._current_parent
        try:
            self.set_env(name)
            yield self
        finally:
            self._current_parent = prev

    # ------------------------------------------------------------ write paths

    def extend(self, df: DataFrame) -> None:
        """Append (reference ``extend``, core.py:91-112)."""
        self._write(self._prepare(df), mode="append")

    def stage_extend(self, df: DataFrame) -> "StagedCommit":
        """Write-audit-publish (the Iceberg WAP pattern; no reference
        counterpart): write the batch's data files now, make them visible
        LATER — after arbitrary audit queries have run against exactly the
        files that would land. ``stage_extend`` pays the full write path
        (schema alignment, constraints, clustering, stats/bloom
        collection) but stops before the manifest CAS; the returned
        handle's :meth:`StagedCommit.dataframe` reads the staged files,
        :meth:`StagedCommit.publish` runs the normal optimistic-
        concurrency commit loop, :meth:`StagedCommit.abort` deletes the
        staged dir. Readers never see an unpublished stage (visibility is
        the manifest flip), a crashed auditor strands only an
        unreferenced data dir (reclaimed by :meth:`vacuum`'s age-windowed
        sweep — publish within the vacuum window), and audits cost no
        second write: publish is one small JSON CAS."""
        self._assert_ungoverned("stage_extend")
        if self.commit_mode != "manifest":
            raise TypeError("stage_extend needs commit_mode='manifest' (WAP is a manifest flip)")
        meta = load_meta(self.main_path, spark=self._spark)
        staged = self._apply_clustering(self._prepare(df))
        entry = self._stage_entry(staged, meta=meta)
        return StagedCommit(self, entry)

    def batch_extend(self, dfs: Iterable[DataFrame]) -> None:
        """Reference ``batch_extend`` (core.py:135-136) fans ``extend`` over
        worker threads guarded by path locks; Spark writes are already
        task-parallel, so the idiomatic shape is one union → one job."""
        dfs = list(dfs)
        if not dfs:
            return
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        self.extend(out)

    def replace_all(self, df: DataFrame) -> None:
        """Truncate + load (reference core.py:157-160)."""
        self._write(self._prepare(df), mode="overwrite", dynamic=False)

    def replace_groups(self, df: DataFrame) -> None:
        """Overwrite exactly the partitions present in ``df``, keep the rest
        (reference core.py:153-155) — dynamic partition overwrite."""
        if not self.group_cols:
            raise TypeError("not a grouped table")  # reference core.py:337-338
        self._write(self._prepare(df), mode="overwrite", dynamic=True)

    def replace_records(self, df: DataFrame, by_groups: bool = False) -> None:
        """Keyed upsert (reference core.py:114-133).

        Incoming duplicate keys keep *first* (core.py:119) — first in the
        incoming frame's (partition, row) order. ``by_groups=True`` scopes
        key matching within each partition group, so the same key may live
        in different groups (core.py:114-117). Unmatched keys are appended.

        Scale shape: only partitions containing a matched or incoming key
        are read back and rewritten (dynamic partition overwrite); the rest
        of the table is untouched.
        """
        if not self.index_cols:
            raise TypeError("replace_records needs index_cols (the reified pandas index)")
        if by_groups and not self.group_cols:
            raise TypeError("not a grouped table")
        # by_groups routes each group through its own child repo in the
        # reference (core.py:116-117 → _gb_handle), so incoming dedup is
        # per (group, key) there — match that scoping
        dedup_keys = self.index_cols + (self.group_cols if by_groups else [])
        new = self._dedup_keep_first(self._prepare(df), keys=dedup_keys)
        rmw = self._rmw_baseline()
        old = self._snapshot_df(rmw)
        if old.isEmpty():
            self._write(new, mode="append")
            return
        join_keys = self.index_cols + (self.group_cols if by_groups else [])
        if self.group_cols:
            if by_groups:
                # key matching is scoped within each group, so the touched
                # groups are exactly the incoming frame's group values — no
                # full-table scan needed to find them
                touched_vals = {tuple(r) for r in new.select(*self.group_cols).distinct().collect()}
            else:
                # a key may live in any partition: one full semi-join scan
                # locates the groups holding matched keys (inherent cost;
                # the read-back below is still pruned to those groups)
                # no broadcast hint: the incoming key set is usually
                # batch-sized (AQE auto-broadcasts it under the
                # threshold), but a table-sized upsert source must be
                # allowed to degrade to a shuffle join instead of
                # forcing a driver-OOM broadcast
                touched = (
                    old.join(
                        new.select(*join_keys).distinct(), join_keys, "left_semi"
                    )
                    .select(*self.group_cols)
                    .unionByName(new.select(*self.group_cols))
                    .distinct()
                )
                touched_vals = {tuple(r) for r in touched.collect()}
            # literal partition-key predicates → the read-back scan carries
            # PartitionFilters and touches only the affected directories
            # (partition counts are low-cardinality by design, so the
            # collected value set is tiny even at scale)
            old_touched = old.where(self._group_filter(touched_vals))
            out = old_touched.join(new, join_keys, "left_anti").unionByName(new)
            # break lineage: the write target is also the read source
            out = out.localCheckpoint(eager=True)
            # a key whose group value changed can leave its old partition
            # empty; dynamic overwrite can't express "now empty" — clear those
            # partition dirs explicitly
            kept_vals = {tuple(r) for r in out.select(*self.group_cols).distinct().collect()}
            # ONE commit: the rewrite's new files AND the partitions it
            # emptied publish in the same CAS. Besides saving a manifest
            # round trip, this is a CDC invariant — a logical upsert must
            # be ONE feed version, or a key-applied consumer replaying
            # "overwrite then drop-emptied" as two versions would let the
            # second version's (old-image) deletes erase rows the first
            # inserted under the same keys.
            self._write(
                out, mode="overwrite", dynamic=True, rmw_baseline=rmw,
                prune=touched_vals - kept_vals,
            )
        else:
            out = old.join(new, join_keys, "left_anti").unionByName(new)
            out = out.localCheckpoint(eager=True)
            self._write(out, mode="overwrite", dynamic=False, rmw_baseline=rmw)

    def merge(
        self,
        source: DataFrame,
        update: dict[str, str] | str | None = "all",
        update_condition: str | None = None,
        delete_condition: str | None = None,
        insert: bool = True,
        merge_schema: bool = False,
    ) -> None:
        """SQL MERGE INTO over the keyed table (the Delta/Iceberg MERGE
        shape; no reference counterpart — core.py can only upsert whole
        rows via replace_records). Rows match on ``index_cols``; then,
        in clause order:

        - matched + ``delete_condition`` (SQL expr over ``src.``/``tgt.``
          namespaces) → row deleted;
        - matched + ``update_condition`` (default: always; a NULL-
          evaluating condition is NOT taken — SQL MERGE's
          unknown-is-false rule, same as the delete clause) → row updated:
          ``update="all"`` takes every source column (keys and partition
          group columns keep the target's values); a dict maps target
          column → SQL expr over ``src.``/``tgt.`` (e.g.
          ``{"value": "tgt.value + src.value"}``);
        - matched otherwise → row kept unchanged;
        - unmatched source rows → inserted when ``insert=True``, else
          dropped; unmatched target rows are always kept.

        Duplicate source keys keep FIRST in incoming order (the
        replace_records convention; Delta raises instead — documented
        divergence). Updating key or group columns through ``update`` is
        rejected: a key rewrite is a delete+insert, and a group move
        belongs to replace_records' full-row semantics.

        ``merge_schema=True`` (Delta's mergeSchema-on-MERGE): source
        columns — and nested struct members at any depth — absent from
        the target's canonical schema are ADDED through the schema-epoch
        log before the merge runs (metadata-only; manifest mode
        required). Pre-merge rows in untouched partitions surface the
        initial-default semantics of ``add_column`` (typed null) with
        zero rewrite; without the flag, alignment drops unknown
        top-level source columns (the documented default) and unknown
        NESTED members raise.

        Scale shape, same as replace_records: one semi-join locates the
        partitions holding matched keys; only those (plus partitions
        receiving inserts) are read back, merged via ONE full-outer join
        on the keys, and dynamically overwritten — O(touched partitions),
        never O(table). Partitions emptied by deletes are cleared."""
        # governance check FIRST: merge_schema performs durable DDL and
        # the merge itself rewrites partitions — a governed consumer must
        # be refused before any metadata is touched, not at the final
        # write step
        self._assert_ungoverned("merge")
        if not self.index_cols:
            raise TypeError("merge needs index_cols (the match key)")
        if merge_schema:
            self._merge_schema_from(source)
        protected = set(self.index_cols) | set(self.group_cols)
        if isinstance(update, dict):
            bad = protected & set(update)
            if bad:
                raise ValueError(f"merge cannot update key/group columns: {sorted(bad)}")
            tgt_cols = set(self.get_full_df().columns)
            unknown = set(update) - tgt_cols
            if unknown and tgt_cols:
                # a typo'd column would otherwise make the merge a silent
                # no-op update (the clause is only consulted per target
                # column) — fail loudly instead
                raise ValueError(f"merge update targets unknown columns: {sorted(unknown)}")
        elif update not in ("all", None):
            raise ValueError(f"update must be 'all', None, or a dict: {update!r}")
        src = self._dedup_keep_first(self._prepare(source), keys=self.index_cols)
        rmw = self._rmw_baseline()
        old = self._snapshot_df(rmw)
        keys = self.index_cols
        if old.isEmpty():
            if insert:
                self._write(src, mode="append")
            return

        from functools import reduce

        def _merged(old_side: DataFrame) -> DataFrame:
            t = old_side.withColumn("__tp", F.lit(True)).alias("tgt")
            s = src.withColumn("__sp", F.lit(True)).alias("src")
            # SQL equality, NOT eqNullSafe: a NULL key component never
            # matches — the same convention as replace_records /
            # delete_records / delete_records_dv, so the same logical
            # upsert produces the same row set whichever API runs it
            # (NULL-keyed source rows fall to the unmatched-insert path)
            cond = reduce(
                lambda a, b: a & b,
                [F.col(f"tgt.{k}") == F.col(f"src.{k}") for k in keys],
            )
            j = t.join(s, cond, "full_outer")
            matched = F.col("tgt.__tp").isNotNull() & F.col("src.__sp").isNotNull()
            src_only = F.col("tgt.__tp").isNull() & F.col("src.__sp").isNotNull()
            delc = (
                F.coalesce(F.expr(delete_condition), F.lit(False))
                if delete_condition
                else F.lit(False)
            )
            # NULL-evaluating conditions are NOT taken (row kept
            # unchanged) — SQL MERGE's unknown-is-false rule, and the
            # same coalesce the delete clause above applies
            updc = (
                F.coalesce(F.expr(update_condition), F.lit(False))
                if update_condition
                else F.lit(True)
            )
            keep = ~(matched & delc)
            if not insert:
                keep = keep & ~src_only
            out_cols = []
            for c in old.columns:
                tgt_c, src_c = F.col(f"tgt.{c}"), F.col(f"src.{c}")
                if update is None or c in protected:
                    upd = tgt_c
                elif update == "all":
                    upd = src_c
                else:
                    upd = F.expr(update[c]) if c in update else tgt_c
                out_cols.append(
                    F.when(src_only, src_c)
                    .when(matched & updc, upd)
                    .otherwise(tgt_c)
                    .alias(c)
                )
            return j.where(keep).select(*out_cols)

        if self.group_cols:
            # matched keys may live in any partition: one semi-join scan
            # locates their groups; inserts land in the source's groups
            # unhinted: AQE broadcasts a batch-sized source's keys by its
            # own size estimate; a table-sized merge source degrades to a
            # shuffle join instead of OOM (Delta's file-location shape)
            touched = (
                old.join(
                    src.select(*keys).distinct(), keys, "left_semi"
                ).select(*self.group_cols)
            )
            if insert:
                touched = touched.unionByName(src.select(*self.group_cols))
            touched_vals = {tuple(r) for r in touched.distinct().collect()}
            if not touched_vals:
                return
            old_touched = old.where(self._group_filter(touched_vals))
            out = _merged(old_touched).localCheckpoint(eager=True)
            kept_vals = {tuple(r) for r in out.select(*self.group_cols).distinct().collect()}
            # single-commit publish, files + emptied-partition prune in
            # one CAS (see replace_records — also the one-version-per-
            # logical-op CDC invariant). kept_vals empty → the entry has
            # no files and only the prune applies.
            self._write(
                out, mode="overwrite", dynamic=True, rmw_baseline=rmw,
                prune=touched_vals - kept_vals,
            )
        else:
            out = _merged(old).localCheckpoint(eager=True)
            self._write(out, mode="overwrite", dynamic=False, rmw_baseline=rmw)

    def purge(self) -> None:
        """Drop the table (reference core.py:162-167)."""
        self._assert_ungoverned("purge")
        from .schema_log import invalidate_cache

        self._fs().delete(self.main_path)
        # a table recreated at this root must not inherit the purged
        # table's cached schema epochs (epoch paths are deterministic)
        invalidate_cache(self.main_path)

    def extend_fenced(self, df: DataFrame, fence: tuple) -> None:
        """Idempotent append for streaming sinks (manifest mode only): the
        commit records ``fence`` — (stream id, epoch) — and a replayed
        batch with the same fence is a no-op BEFORE any write job runs.
        This is what turns foreachBatch's at-least-once replay contract
        into exactly-once appends: the batch's data and its fence publish
        in one atomic manifest CAS, so a crash between write and commit
        leaves only an unreferenced data dir (manifest vacuum sweeps it),
        never duplicate visible rows."""
        self._write(self._prepare(df), mode="append", fence=fence)

    def clone_to(self, dest_root: str) -> "TableRepo":
        """SHALLOW clone (manifest mode): publish at ``dest_root`` a
        manifest whose commits reference THIS table's data dirs by
        absolute ``base`` path — a full logical copy with ZERO data
        copied, instantly. The clone is snapshot-isolated from the
        source (it pins the commit list as of now; later source commits
        don't appear) and independently writable (its own appends land
        under its own root). The dev/test-against-prod-data primitive.

        Caveat (same as Delta shallow clones): vacuum on the SOURCE can
        delete data dirs the clone still references — run clones inside
        the source's vacuum retention window, or rewrite the clone
        (``replace_all(clone.get_full_df())``) to materialize it."""
        self._assert_ungoverned("clone_to")
        if self.commit_mode != "manifest":
            raise TypeError("clone_to() requires commit_mode='manifest'")
        from .manifest import load_manifest, try_commit

        fs = self._fs()
        mf = load_manifest(fs, self.main_path)
        clone = TableRepo(
            dest_root,
            group_cols=list(self.group_cols) or None,
            index_cols=list(self.index_cols) or None,
            commit_mode="manifest",
            compression=self.compression,
            spark=self._spark,
        )
        commits = [
            {**c, "base": c.get("base", self.main_path)}
            for c in (mf["commits"] if mf else [])
        ]
        nxt = {
            "version": 1,
            "commits": commits,
            "spec": list(self.group_cols),
            "op": f"clone({self.main_path})",
        }
        return self._finish_clone(clone, nxt, dest_root)

    def _finish_clone(self, clone: "TableRepo", nxt: dict, dest_root: str) -> "TableRepo":
        from .manifest import try_commit
        if not try_commit(clone._fs(), clone.main_path, nxt):
            raise RuntimeError(f"clone target {dest_root} already has a manifest")
        # sidecar only AFTER the CAS: a refused clone onto an existing
        # table must not clobber that table's canonical schema
        meta = load_meta(self.main_path, spark=self._spark)
        if meta is not None:
            save_meta(clone.main_path, meta, spark=self._spark)
        # schema epochs travel with the commits: cloned entries keep their
        # schema_v stamps, which are unreadable without the epoch log
        from .schema_log import load_schema_log, publish_schema_version

        for e in load_schema_log(self._fs(), self.main_path):
            publish_schema_version(clone._fs(), clone.main_path, e["fields"], e["v"])
        return clone

    # ------------------------------------------------------------- branches

    def _branch_root(self, name: str) -> str:
        if not name or "/" in name or name.startswith((".", "_")):
            raise ValueError(f"bad branch name: {name!r}")
        return join_path(self.main_path, "_pqrs_branches", name)

    def create_branch(self, name: str) -> "TableRepo":
        """Writable BRANCH (Iceberg branch shape): a shallow clone of the
        current snapshot living under ``_pqrs_branches/<name>`` inside
        the table root — zero data copied, its own manifest chain, fully
        writable through every TableRepo op. The multi-commit audit
        flavor of WAP: run a whole pipeline of staged changes on the
        branch, validate the end state, then :meth:`merge_branch` to
        fast-forward main; or walk away and :meth:`delete_branch`. The
        fork version is recorded so merge can detect concurrent main
        commits (no rebase — the branch holder re-branches)."""
        self._assert_ungoverned("create_branch")
        if self.commit_mode != "manifest":
            raise TypeError("create_branch() requires commit_mode='manifest'")
        import json as _json

        from .manifest import load_manifest

        broot = self._branch_root(name)
        fs = self._fs()
        cur = load_manifest(fs, self.main_path)
        forked_at = cur["version"] if cur else 0
        b = self.clone_to(broot)
        fs.write_text_atomic(
            join_path(broot, "_pqrs_branch.json"),
            _json.dumps({"source": self.main_path, "forked_at": forked_at}),
        )
        return b

    def branch(self, name: str) -> "TableRepo":
        """Handle on an existing branch — a TableRepo rooted at its dir."""
        broot = self._branch_root(name)
        if not self._fs().exists(join_path(broot, "_pqrs_branch.json")):
            raise KeyError(f"no branch {name!r} on {self.name}")
        return TableRepo(
            broot,
            group_cols=list(self.group_cols) or None,
            index_cols=list(self.index_cols) or None,
            commit_mode="manifest",
            compression=self.compression,
            # a governed handle must not mint itself an ungoverned branch
            # handle: the branch sidecar carries the fork-time policy and
            # the returned handle keeps enforcing it
            governed=self.governed,
            governed_as=self.governed_as,
            spark=self._spark,
        )

    def branches(self) -> list[str]:
        """Names of the table's branches."""
        out = []
        for path, _ in self._fs().list_dirs(join_path(self.main_path, "_pqrs_branches")):
            out.append(path.rstrip("/").rsplit("/", 1)[-1])
        return sorted(out)

    def merge_branch(self, name: str) -> None:
        """Fast-forward main to the branch's current state. Allowed only
        while main still sits at the branch's fork version — a concurrent
        main commit makes the branch's end state unmergeable as-is
        (conflict surfaces as an error; re-branch and replay). The merge
        is metadata-only: main's next version adopts the branch's commit
        list wholesale, branch-written entries anchored at the branch
        root by ``base`` (same shallow-reference mechanics as clones —
        the branch dir remains those files' physical home until a
        rewrite; :meth:`delete_branch` refuses while main references
        it)."""
        self._assert_ungoverned("merge_branch")
        import json as _json

        from .manifest import load_manifest, try_commit

        broot = self._branch_root(name)
        fs = self._fs()
        info = _json.loads(fs.read_text(join_path(broot, "_pqrs_branch.json")))
        bmf = load_manifest(fs, broot)
        if bmf is None:
            raise RuntimeError(f"branch {name!r} has no committed version")
        from .schema_log import load_schema_log

        if [(e["v"], e["fields"]) for e in load_schema_log(fs, broot)] != [
            (e["v"], e["fields"]) for e in load_schema_log(fs, self.main_path)
        ]:
            # CONTENT compare, not version numbers: symmetric divergence
            # (one DDL on main, a different one on the branch) produces
            # equal version lists whose epoch-mapped reads disagree
            # branch-local DDL would import commit stamps main's epoch log
            # can't resolve; schema evolution is a main-branch operation
            raise RuntimeError(
                f"merge_branch({name!r}): branch and main schema logs "
                "diverged — run schema DDL on main, not on branches"
            )
        merged = [{**c, "base": c.get("base", broot)} for c in bmf["commits"]]
        cur = load_manifest(fs, self.main_path)
        cur_v = cur["version"] if cur else 0
        if cur_v != info["forked_at"]:
            raise RuntimeError(
                f"merge_branch({name!r}): main moved {info['forked_at']} -> "
                f"{cur_v} since the fork; re-branch and replay"
            )
        nxt = {
            "version": cur_v + 1,
            "commits": merged,
            "spec": bmf.get("spec", list(self.group_cols)),
            "op": f"merge-branch({name})",
        }
        if not try_commit(fs, self.main_path, nxt, prev_ts=(cur or {}).get("ts", 0.0)):
            raise RuntimeError(
                f"merge_branch({name!r}): lost the CAS to a concurrent main "
                "commit; re-branch and replay"
            )

    def delete_branch(self, name: str, force: bool = False) -> None:
        """Drop a branch dir. Refuses (without ``force``) while any
        retained MAIN version still references the branch's data by
        ``base`` — deleting then would corrupt merged history."""
        self._assert_ungoverned("delete_branch")
        from .manifest import load_manifest

        broot = self._branch_root(name)
        fs = self._fs()
        if not force:
            for v in self.versions():
                mf = load_manifest(fs, self.main_path, v)
                if any(c.get("base") == broot for c in (mf or {}).get("commits", [])):
                    raise RuntimeError(
                        f"main version {v} references branch {name!r} data; "
                        "rewrite main (compact/replace_all) or pass force=True"
                    )
        fs.delete(broot)
        # a recreated branch republishes epoch paths under the same root —
        # same cache-reuse hazard purge() guards on the main table
        from .schema_log import invalidate_cache

        invalidate_cache(broot)

    # ------------------------------------------------- schema DDL (metadata-only)

    def declare(self) -> None:
        """Persist the canonical sidecar for a NEVER-WRITTEN table from
        ``fixed_schema`` — CREATE TABLE's durable declaration (the SQL
        front door routes here). Afterwards, and before any row lands:
        reads surface an empty canonical-schema frame instead of a
        zero-column one, schema DDL can bootstrap epoch 1, positional
        SQL INSERT knows the declared column order, and
        :meth:`TableRepo.open` reconstructs the handle from the sidecar
        config. Exactly the metadata the first write would persist
        (see :meth:`_align`) — landed eagerly, no data file touched.
        No-op if the sidecar already exists (declared or written)."""
        if self.fixed_schema is None:
            raise ValueError("declare() requires fixed_schema")
        if load_meta(self.main_path, spark=self._spark) is not None:
            return
        from ..plans.schema import as_nullable

        save_meta(
            self.main_path,
            TableMeta(
                schema=as_nullable(self.fixed_schema),
                group_cols=self.group_cols,
                index_cols=self.index_cols,
                extra_metadata=self.extra_metadata,
                config=self._handle_config(),
            ),
            spark=self._spark,
        )

    def schema_log(self) -> list[dict]:
        """Every published schema epoch (empty for a table that has never
        seen DDL). Observability face of the evolution machinery — each
        entry is ``{"v": n, "fields": [{"id", "name", "type"}, ...]}``."""
        from .schema_log import load_schema_log

        return load_schema_log(self._fs(), self.main_path)

    def add_column(self, name: str, dtype, default=None) -> None:
        """Metadata-only ADD COLUMN (manifest mode): the field joins the
        canonical schema under a fresh field id; no file is touched, and
        files from older epochs surface typed nulls on read — the
        lakehouse replacement for the reference's rewrite-every-file
        widening (core.py:411-421). ``dtype`` is a Spark DataType or DDL
        string ('bigint', 'array<double>', ...).

        ``default`` is the Iceberg-v3 *initial default*: rows written
        BEFORE the column existed read back as this constant instead of
        null — a read-time literal folded into each old commit's
        projection, still zero rewrite. Rows written after (including
        aligned writes that omit the column) store real values (or real
        nulls): the default describes history, it does not shadow new
        data. Scalars only (they live in the epoch JSON)."""
        self._assert_ungoverned("add_column")
        dt = self._parse_dtype(dtype)
        if default is not None and not isinstance(default, (str, int, float, bool)):
            raise TypeError(
                f"add_column: default must be a JSON scalar, got {type(default).__name__}"
            )

        def mutate(fields, log):
            from .schema_log import next_field_id

            if any(f["name"].lower() == name.lower() for f in fields):
                raise ValueError(f"add_column: column {name!r} already exists")
            fld = {"id": next_field_id(log), "name": name, "type": dt.jsonValue()}
            if default is not None:
                fld["default"] = default
            return fields + [fld]

        self._evolve_schema(mutate)

    def rename_column(self, old: str, new: str) -> None:
        """Metadata-only RENAME COLUMN: same field id, new current name.
        Files written before the rename are read WITH their epoch's name
        and aliased — no rewrite, no null-out of history (the failure
        mode of name-based parquet evolution that Iceberg field ids /
        Delta column mapping exist to prevent)."""
        self._assert_ungoverned("rename_column")
        self._refuse_structural(old, "rename_column")

        def mutate(fields, log):
            names = {f["name"] for f in fields}
            if old not in names:
                raise KeyError(f"rename_column: no column {old!r}")
            if any(f["name"].lower() == new.lower() for f in fields):
                raise ValueError(f"rename_column: column {new!r} already exists")
            return [
                ({**f, "name": new} if f["name"] == old else f) for f in fields
            ]

        self._evolve_schema(mutate)

    def drop_column(self, name: str) -> None:
        """Metadata-only DROP COLUMN: the field leaves the current epoch;
        older files simply stop projecting it. Its id is never reused, so
        a later ``add_column`` of the same name is a NEW column and old
        data correctly reads as null rather than resurrecting."""
        self._assert_ungoverned("drop_column")
        self._refuse_structural(name, "drop_column")

        def mutate(fields, log):
            kept = [f for f in fields if f["name"] != name]
            if len(kept) == len(fields):
                raise KeyError(f"drop_column: no column {name!r}")
            if not kept:
                raise ValueError("drop_column: cannot drop the last column")
            return kept

        self._evolve_schema(mutate)

    def alter_column_type(self, name: str, dtype) -> None:
        """Metadata-only type WIDENING (int→long, float→double, decimal
        precision growth — the Iceberg-compatible exact promotions).
        Older files cast on read; anything lossy is refused (backfill a
        new column instead)."""
        self._refuse_structural(name, "alter_column_type")
        dt = self._parse_dtype(dtype)

        def mutate(fields, log):
            from .schema_log import is_safe_widening

            for f in fields:
                if f["name"] == name:
                    if f["type"] == dt.jsonValue():
                        raise ValueError(
                            f"alter_column_type: {name!r} is already {dt.simpleString()}"
                        )
                    if not is_safe_widening(f["type"], dt.jsonValue()):
                        raise ValueError(
                            f"alter_column_type: {f['type']!r} -> "
                            f"{dt.simpleString()!r} is not a safe widening"
                        )
                    return [
                        ({**g, "type": dt.jsonValue()} if g["name"] == name else g)
                        for g in fields
                    ]
            raise KeyError(f"alter_column_type: no column {name!r}")

        self._evolve_schema(mutate)

    # --- one level of NESTED struct DDL (Iceberg nested field ids) ---

    def add_struct_field(self, col: str, name: str, dtype, default=None) -> None:
        """Metadata-only ADD of a field INSIDE a struct column: the new
        nested field gets a fresh id (top-level and nested ids share one
        namespace, never reused); files from older epochs surface the
        ``default`` (or null) for it on read — zero rewrite, the
        Iceberg nested-field-id shape one level deep (the in-repo user
        is the multimodal ``meta`` struct, operators/multimodal.py)."""
        dt = self._parse_dtype(dtype)
        if default is not None and not isinstance(default, (str, int, float, bool)):
            raise TypeError(
                f"add_struct_field: default must be a JSON scalar, got "
                f"{type(default).__name__}"
            )

        def mut(nested, alloc):
            if any(n["name"].lower() == name.lower() for n in nested):
                raise ValueError(
                    f"add_struct_field: {col}.{name} already exists"
                )
            fld = {"id": alloc(), "name": name, "type": dt.jsonValue()}
            if default is not None:
                fld["default"] = default
            return nested + [fld]

        self._nested_ddl(col, "add_struct_field", mut, member=name)

    def rename_struct_field(self, col: str, old: str, new: str) -> None:
        """Metadata-only RENAME of a struct member: same nested id, new
        name; old files are read with their epoch's nested name and
        re-struct-ed — no rewrite, no null-out (a positional struct cast
        cannot express this; the nested id can)."""

        def mut(nested, alloc):
            if not any(n["name"] == old for n in nested):
                raise KeyError(f"rename_struct_field: no field {col}.{old}")
            if any(n["name"].lower() == new.lower() for n in nested):
                raise ValueError(f"rename_struct_field: {col}.{new} already exists")
            return [({**n, "name": new} if n["name"] == old else n) for n in nested]

        self._nested_ddl(col, "rename_struct_field", mut, member=old)

    def drop_struct_field(self, col: str, name: str) -> None:
        """Metadata-only DROP of a struct member; its id is never reused,
        so a later re-add of the same name is a NEW field and old data
        correctly reads as null/default rather than resurrecting."""

        def mut(nested, alloc):
            kept = [n for n in nested if n["name"] != name]
            if len(kept) == len(nested):
                raise KeyError(f"drop_struct_field: no field {col}.{name}")
            if not kept:
                raise ValueError(
                    "drop_struct_field: cannot drop the struct's last field "
                    "(drop_column the struct instead)"
                )
            return kept

        self._nested_ddl(col, "drop_struct_field", mut, member=name)

    def alter_struct_field_type(self, col: str, name: str, dtype) -> None:
        """Metadata-only type WIDENING of a struct member (same safe set
        as alter_column_type); older files cast the leaf on read."""
        dt = self._parse_dtype(dtype)

        def mut(nested, alloc):
            from .schema_log import is_safe_widening

            for n in nested:
                if n["name"] == name:
                    if n["type"] == dt.jsonValue():
                        raise ValueError(
                            f"alter_struct_field_type: {col}.{name} is already "
                            f"{dt.simpleString()}"
                        )
                    if not is_safe_widening(n["type"], dt.jsonValue()):
                        raise ValueError(
                            f"alter_struct_field_type: {n['type']!r} -> "
                            f"{dt.simpleString()!r} is not a safe widening"
                        )
                    return [
                        ({**g, "type": dt.jsonValue()} if g["name"] == name else g)
                        for g in nested
                    ]
            raise KeyError(f"alter_struct_field_type: no field {col}.{name}")

        self._nested_ddl(col, "alter_struct_field_type", mut, member=name)

    def _nested_ddl(self, col: str, op: str, mutate_nested, member: str | None = None) -> None:
        """Shared nested-DDL loop. ``col`` may be a dotted PATH
        (``meta``, ``meta.exif``, ``frames.tags`` where ``frames`` is an
        ``array<struct>``): each segment after the first descends one
        member level, passing transparently through array/map containers
        (the member list always describes the struct the type bottoms
        out in — :func:`~.schema_log.descend_containers`). The mutation
        applies to the member list AT the path; ancestor type jsons are
        recomputed bottom-up so every ``type`` stays in lockstep with
        its ``fields``.

        When the column's epochs predate nested ids (at any depth along
        the tree), the id backfill publishes as its OWN epoch first —
        names and types unchanged, ids assigned positionally — and only
        then does the mutation publish. The two-epoch shape is load-
        bearing for old files: pre-id epochs synthesize their member ids
        from the FIRST id-bearing epoch (nested_fields_for), so that
        epoch must be name-stable with them; folding the backfill into
        the mutation epoch would make a rename-as-first-nested-DDL
        filter the renamed member out of the synthesis and silently read
        every old row's value as NULL."""
        self._assert_ungoverned(op)
        top, *path = col.split(".")
        # path-precise governance pin: the affected member (or the whole
        # path for member-less ops) may not be a masked path, an ancestor
        # of one, or a descendant — siblings stay evolvable
        affected = f"{col}.{member}" if member else col
        self._refuse_structural(top, op, nested_path=affected)

        class _Bootstrapped(Exception):
            pass

        def _ensure_ids(entry, alloc) -> tuple[dict, bool]:
            """(entry with ids at every struct level, grew?) — positional
            assignment exactly where missing, existing ids untouched."""
            from .schema_log import descend_containers

            st, _ = descend_containers(entry.get("type"))
            if st is None:
                return entry, False
            grew = False
            members = entry.get("fields")
            if members is None:
                members = [
                    {"id": alloc(), "name": fd["name"], "type": fd["type"]}
                    for fd in st.get("fields", [])
                ]
                grew = True
            fixed = []
            for m in members:
                m2, g = _ensure_ids(m, alloc)
                grew = grew or g
                fixed.append(m2)
            return {**entry, "fields": fixed}, grew

        def bootstrap(fields, log):
            from .schema_log import descend_containers, next_field_id

            out, hit, grew = [], False, False
            nid = next_field_id(log)

            def alloc():
                nonlocal nid
                nid += 1
                return nid - 1

            for f in fields:
                if f["name"] != top:
                    out.append(f)
                    continue
                hit = True
                if descend_containers(f.get("type"))[0] is None:
                    raise TypeError(f"{op}: column {top!r} has no struct content")
                f2, g = _ensure_ids(f, alloc)
                grew = grew or g
                out.append(f2)
            if not hit:
                raise KeyError(f"{op}: no column {top!r}")
            if not grew:
                raise _Bootstrapped()  # ids complete everywhere already
            return out

        try:
            self._evolve_schema(bootstrap)
        except _Bootstrapped:
            pass

        def mutate(fields, log):
            from .schema_log import next_field_id, retype_entry

            start = next_field_id(log)
            ctr = iter(range(start, start + 1_000_000))

            def descend(entry, segs):
                """Apply the mutation under ``entry`` following ``segs``;
                returns the rebuilt entry (types recomputed on the way
                back up)."""
                from .schema_log import descend_containers

                if descend_containers(entry.get("type"))[0] is None:
                    raise TypeError(
                        f"{op}: {entry['name']!r} (in path {col!r}) has no "
                        "struct content"
                    )
                nested = entry.get("fields")
                if nested is None:  # a concurrent purge/rewrite of the log
                    raise RuntimeError(
                        f"{op}: {col!r} lost its nested ids between the "
                        "backfill and the mutation — retry"
                    )
                if not segs:
                    new = mutate_nested(list(nested), lambda: next(ctr))
                else:
                    seg, rest = segs[0], segs[1:]
                    new, found = [], False
                    for m in nested:
                        if m["name"] == seg:
                            found = True
                            new.append(descend(m, rest))
                        else:
                            new.append(m)
                    if not found:
                        raise KeyError(f"{op}: no member {seg!r} under {col!r}")
                return retype_entry({**entry, "fields": new})

            out, hit = [], False
            for f in fields:
                if f["name"] != top:
                    out.append(f)
                    continue
                hit = True
                out.append(descend(f, path))
            if not hit:
                raise KeyError(f"{op}: no column {top!r}")
            return out

        self._evolve_schema(mutate)

    def _epoch_field_expr(self, src: dict, f: dict, tgt, slog: list) -> "F.Column":
        """Map ONE field of an old-epoch commit scan to the current
        epoch: rename → alias, widen → cast, and for struct-content
        columns a NESTED field-id mapping AT EVERY DEPTH (member rename
        → alias, member widen → cast, added-later member → its initial
        default or null, dropped member → omitted) that a positional
        struct cast cannot express. Arrays and maps pass through
        higher-order functions (``transform`` / ``transform_values``) so
        an ``array<struct>`` or ``map<k, struct>`` column evolves per
        ELEMENT with zero row explosion — the whole mapping stays one
        codegen projection. NULL structs stay NULL — F.struct of the
        mapped children would otherwise resurrect them as all-null
        rows; higher-order fns are null-propagating by definition."""
        from .schema_log import nested_fields_for, schema_of_fields

        cur_nested = f.get("fields")
        if cur_nested:
            src_nested = nested_fields_for(src, slog)
            if src_nested is not None:
                return self._nested_map_expr(
                    F.col(src["name"]), tgt, src_nested, cur_nested
                ).alias(f["name"])
        return F.col(src["name"]).cast(tgt).alias(f["name"])

    @classmethod
    def _nested_map_expr(cls, src_expr, tgt, src_members, cur_members):
        """Recursive id-driven mapping of one struct-content expression
        onto its current-epoch type (see :meth:`_epoch_field_expr`).
        ``src_members`` / ``cur_members`` are the resolved member trees;
        a member level where either side carries no ids never changed
        shape (ids, once assigned, persist through every later epoch),
        so it safely falls back to a plain cast."""
        from .schema_log import schema_of_fields

        if isinstance(tgt, T.ArrayType):
            return F.when(
                src_expr.isNotNull(),
                F.transform(
                    src_expr,
                    lambda x: cls._nested_map_expr(
                        x, tgt.elementType, src_members, cur_members
                    ),
                ),
            ).otherwise(F.lit(None).cast(tgt))
        if isinstance(tgt, T.MapType):
            return F.when(
                src_expr.isNotNull(),
                F.transform_values(
                    src_expr,
                    lambda _k, v: cls._nested_map_expr(
                        v, tgt.valueType, src_members, cur_members
                    ),
                ),
            ).otherwise(F.lit(None).cast(tgt))
        if not isinstance(tgt, T.StructType):
            return src_expr.cast(tgt)
        by_id = {m["id"]: m for m in src_members}
        parts = []
        for m in cur_members:
            mtgt = schema_of_fields([m]).fields[0].dataType
            s = by_id.get(m["id"])
            if s is None:
                parts.append(F.lit(m.get("default")).cast(mtgt).alias(m["name"]))
                continue
            child = src_expr.getField(s["name"])
            sub_src, sub_cur = s.get("fields"), m.get("fields")
            # recursion gate compares the ENTRIES (ids included), never
            # just type jsons: a drop-then-readd reproduces an identical
            # type json with a different member id, and a positional cast
            # would resurrect the dropped values
            if sub_src and sub_cur and s != m:
                parts.append(
                    cls._nested_map_expr(child, mtgt, sub_src, sub_cur).alias(m["name"])
                )
            else:
                parts.append(child.cast(mtgt).alias(m["name"]))
        return (
            F.when(src_expr.isNotNull(), F.struct(*parts))
            .otherwise(F.lit(None).cast(tgt))
        )

    def _parse_dtype(self, dtype) -> T.DataType:
        if isinstance(dtype, T.DataType):
            return dtype
        return T.StructType.fromDDL(f"`c` {dtype}").fields[0].dataType

    def _refuse_structural(
        self, name: str, op: str, nested_path: str | None = None
    ) -> None:
        """Partition and key columns anchor directory layout, upsert
        matching, and dv tombstones — renaming/dropping them is a table
        REBUILD, not a metadata flip; refuse loudly. A column a
        governance policy MASKS is likewise pinned (silently breaking or
        orphaning a mask is a governance hole): drop or re-point the
        policy first. Filter/mask EXPRESSIONS referencing other columns
        are the policy author's contract to maintain — SQL strings are
        not rewritten by DDL."""
        meta = load_meta(self.main_path, spark=self._spark)
        # check the PERSISTED layout facts, not just this handle's ctor
        # args: a read-style handle opened without index_cols could
        # otherwise rename a key column and break every dv tombstone join
        group_cols = set(self.group_cols) | set((meta and meta.group_cols) or ())
        index_cols = set(self.index_cols) | set((meta and meta.index_cols) or ())
        if name in group_cols:
            raise ValueError(f"{op}: {name!r} is a partition column")
        if name in index_cols:
            raise ValueError(f"{op}: {name!r} is a key (index) column")
        cfg = (meta and meta.config) or {}
        pols = [cfg.get("policy") or {}]
        pols += list((cfg.get("role_policies") or {}).values())
        masks = {c for p in pols for c in (p.get("column_masks") or {})}
        if nested_path is None:
            # top-level DDL: the column itself masked, or NESTED masks
            # bound anywhere under it (renaming/dropping the top would
            # orphan the dotted binding — same governance hole)
            hit = sorted(
                m for m in masks if m == name or m.split(".")[0] == name
            )
        else:
            # nested DDL: path-precise — refuse only when the affected
            # dotted path IS a masked path, an ancestor of one, or a
            # descendant of one; sibling members stay evolvable
            hit = sorted(
                m
                for m in masks
                if m == nested_path
                or m.startswith(nested_path + ".")
                or nested_path.startswith(m + ".")
            )
        if hit:
            raise ValueError(
                f"{op}: {hit[0]!r} is masked by a governance policy (default "
                "or role grant) — set_policy() without it (or re-pointed) "
                "first"
            )
        gen = ((meta and meta.config) or {}).get("generated_cols") or {}
        if name in gen:
            raise ValueError(
                f"{op}: {name!r} is a GENERATED column — clear it via "
                "set_table_properties(generated_cols=...) first (its "
                "expression, like every persisted SQL string, is not "
                "rewritten by DDL)"
            )

    def _merge_schema_from(self, source: DataFrame) -> None:
        """Schema evolution on MERGE (Delta ``mergeSchema``): add every
        source column / nested struct member the canonical schema lacks,
        through the S33 epoch log — metadata commits only, no file
        rewritten, no data job. Top-level adds batch into ONE epoch;
        nested adds follow per dotted path. Type conflicts on EXISTING
        columns are not touched here — alignment's cast rules (and its
        loud unknown-member error) still govern those."""
        if self.commit_mode != "manifest":
            raise TypeError(
                "merge(merge_schema=True) requires commit_mode='manifest' "
                "(schema DDL lives in the manifest epoch log)"
            )
        target = self.get_full_df().schema
        if not target.fields:
            # never-written table: the first write adopts the incoming
            # schema wholesale — nothing to evolve
            return
        have = {f.name.lower(): f for f in target.fields}
        new_top = [f for f in source.schema.fields if f.name.lower() not in have]
        if new_top:

            def mutate(fields, log):
                from .schema_log import next_field_id

                nid = next_field_id(log)
                added = []
                for i, f in enumerate(new_top):
                    added.append(
                        {"id": nid + i, "name": f.name, "type": f.dataType.jsonValue()}
                    )
                return fields + added

            self._evolve_schema(mutate)

        def nested_adds(src_dt, tgt_dt, path):
            while isinstance(src_dt, T.ArrayType) and isinstance(tgt_dt, T.ArrayType):
                src_dt, tgt_dt = src_dt.elementType, tgt_dt.elementType
            while isinstance(src_dt, T.MapType) and isinstance(tgt_dt, T.MapType):
                src_dt, tgt_dt = src_dt.valueType, tgt_dt.valueType
            if not (
                isinstance(src_dt, T.StructType) and isinstance(tgt_dt, T.StructType)
            ):
                return
            members = {c.name.lower(): c for c in tgt_dt.fields}
            for c in src_dt.fields:
                m = members.get(c.name.lower())
                if m is None:
                    self.add_struct_field(path, c.name, c.dataType)
                else:
                    nested_adds(c.dataType, m.dataType, f"{path}.{m.name}")

        for f in source.schema.fields:
            m = have.get(f.name.lower())
            if m is not None:
                nested_adds(f.dataType, m.dataType, m.name)

    def _undecided_txn_markers(self) -> list[str]:
        """Distinct STILL-PENDING transaction markers among this table's
        current manifest entries — the set that makes schema DDL refuse
        (see :meth:`_evolve_schema`). Resolved marker states are cached
        process-wide by ``txn_state``, so this is O(in-flight txns)."""
        from .manifest import load_manifest, txn_state

        mf = load_manifest(self._fs(), self.main_path)
        out: list[str] = []
        for c in (mf or {}).get("commits", []):
            m = c.get("txn")
            if m and m not in out and txn_state(m) == "pending":
                out.append(m)
        return out

    def _evolve_schema(self, mutate) -> None:
        """Shared DDL loop: bootstrap epoch 1 from the canonical sidecar
        schema if this is the table's first DDL, apply ``mutate`` to the
        current epoch's field list, CAS-publish the next epoch (losers
        reload and re-validate), then refresh the sidecar cache so plain
        writers align to the new shape."""
        if self.commit_mode != "manifest":
            raise TypeError("schema DDL requires commit_mode='manifest'")
        from .schema_log import (
            fields_from_schema,
            load_schema_log,
            publish_schema_version,
            schema_of_fields,
        )

        fs = self._fs()
        while True:
            # conflict-checked DDL (round-7 verdict #4): an epoch flip
            # cannot be gated on a transaction marker (the schema log has
            # no read-side txn resolution, by design — it must stay
            # readable by bare schema() calls), so DDL racing an OPEN
            # transaction that already staged entries on this table is
            # refused loudly instead of silently re-shaping the shared
            # current epoch under the txn's feet. Decided (committed /
            # aborted) txns never block; a crashed coordinator's pending
            # marker blocks until decided or swept — deliberately loud.
            # Re-checked on every CAS retry. Entries landing inside the
            # residual check→publish window stay CORRECT regardless: they
            # stamp the epoch they aligned to and map by field id.
            pending = self._undecided_txn_markers()
            if pending:
                raise RuntimeError(
                    f"schema DDL on {self.name!r} refused: undecided "
                    f"transaction entries present (markers: {pending}) — "
                    "commit/abort the transaction (or sweep_aborted_txns) "
                    "first"
                )
            log = load_schema_log(fs, self.main_path)
            if not log:
                meta = load_meta(self.main_path, spark=self._spark)
                base = (meta and meta.schema) or self.fixed_schema
                if base is None:
                    raise RuntimeError(
                        f"schema DDL on {self.name!r} needs a canonical schema "
                        "— write once (or pass fixed_schema) first"
                    )
                from ..plans.schema import as_nullable

                fields = fields_from_schema(as_nullable(base))
                publish_schema_version(fs, self.main_path, fields, 1)
                continue  # reload: either ours or a concurrent bootstrap won
            cur = log[-1]
            new_fields = mutate([dict(f) for f in cur["fields"]], log)
            self._check_generated_after_ddl(new_fields)
            if publish_schema_version(fs, self.main_path, new_fields, cur["v"] + 1):
                break
        meta = load_meta(self.main_path, spark=self._spark) or TableMeta(
            group_cols=self.group_cols,
            index_cols=self.index_cols,
            extra_metadata=self.extra_metadata,
        )
        from ..plans.schema import as_nullable

        meta.schema = as_nullable(schema_of_fields(new_fields))
        save_meta(self.main_path, meta, spark=self._spark)

    def _check_generated_after_ddl(self, new_fields: list[dict]) -> None:
        """A DDL that renames or drops a column REFERENCED by a persisted
        generated-column expression would brick every subsequent write
        (the expression fails analysis in _apply_generated forever) — the
        Delta rule is to refuse the DDL, so analyze each expression
        against the post-DDL schema and refuse loudly (clear or re-point
        via set_table_properties(generated_cols=...) first). The
        generated TARGET column itself is already pinned by
        _refuse_structural."""
        meta = load_meta(self.main_path, spark=self._spark)
        gen = ((meta and meta.config) or {}).get("generated_cols") or {}
        if not gen:
            return
        from ..plans.schema import as_nullable
        from .schema_log import schema_of_fields

        probe = self._session().createDataFrame(
            [], as_nullable(schema_of_fields(new_fields))
        )
        for c, e in gen.items():
            try:
                probe.select(F.expr(e)).schema
            except Exception as err:
                raise ValueError(
                    f"DDL would break generated column {c!r} = {e!r} "
                    f"(its expression no longer analyzes: {err}); clear or "
                    "re-point it via set_table_properties(generated_cols=...) "
                    "first"
                ) from err

    def changes_between(
        self, start: int, end: int | None = None, row_level: bool = False
    ) -> DataFrame:
        """Row-level CHANGE FEED between two committed versions (manifest
        mode) — the batch CDF face of the commit protocol: rows of files
        present at ``end`` but not ``start`` surface with
        ``_change_type='insert'``, rows of files removed by then with
        ``_change_type='delete'``. File-granular (this repo's ops —
        append, dynamic/static overwrite, delete, restore — all move
        whole files), derived ENTIRELY from the two immutable manifests:
        an upsert that rewrote a partition shows its old files as
        deletes and its new files as inserts, a downstream sync replays
        deletes-then-inserts and converges. ``start=0`` is the empty
        table; ``end=None`` means the latest version. Both manifests
        must still be retained (same caveat as time travel).

        ``row_level=True`` upgrades rewritten-file noise into true row
        deltas (the Delta CDF ``update_preimage``/``update_postimage``
        contract): removed-file rows and added-file rows are keyed on
        ``index_cols`` — keys present only after surface as ``insert``,
        only before as ``delete``, and keys on both sides emit a
        pre/post image pair ONLY when some non-key column actually
        changed (null-safe comparison); untouched rows that merely rode
        along in a partition rewrite disappear from the feed. Cost is
        three equi-joins over only the files the window touched — never
        the table — so a 1-row upsert into a 10k-file table diffs one
        partition's files. Requires unique keys within the diffed
        snapshots (the upsert discipline guarantees it); columns added
        by schema widening compare only where both sides carry them."""
        if self.commit_mode != "manifest":
            raise TypeError("changes_between() requires commit_mode='manifest'")
        from .manifest import load_manifest

        fs = self._fs()
        if end is None:
            vs = self.versions()
            end = vs[-1] if vs else 0
        if start > end:
            # transposed args would return a feed with insert/delete
            # INVERTED — a replaying sync would apply the exact opposite
            # of the real change set; fail loudly instead
            raise ValueError(f"changes_between: start {start} > end {end}")

        def commits_of(version: int) -> list[dict]:
            if version <= 0:
                return []
            mf = load_manifest(fs, self.main_path, version)
            if mf is None:
                raise KeyError(f"no manifest version {version} for {self.name}")
            from .manifest import effective_commits

            # txn gate: a still-pending entry is not part of either diff
            # endpoint; once its marker commits it contributes to every
            # version that carries it (same retroactive-visibility rule
            # as the read path) — and a committed txn-overwrite entry
            # retroactively masks the files it replaced (effective view)
            return effective_commits(mf["commits"], self.group_cols)

        def fset(commits: list[dict], kind) -> set:
            return {
                (c.get("base", self.main_path), c["dir"], f)
                for c in commits
                if (c.get("kind") == "dv") == (kind == "dv")
                for f in c["files"]
            }

        s_commits, e_commits = commits_of(start), commits_of(end)
        s_set, e_set = fset(s_commits, "data"), fset(e_commits, "data")

        def scan(version: int, wanted: set, change: str) -> DataFrame:
            df = self._manifest_df(
                version if version > 0 else None,
                file_keep=lambda c, f: (c.get("base", self.main_path), c["dir"], f)
                in wanted,
            )
            return df.withColumn("_change_type", F.lit(change))

        parts = []
        added, removed = e_set - s_set, s_set - e_set
        if row_level and added and removed:
            if not self.index_cols:
                raise TypeError("row_level change feed needs index_cols")
            keys = list(self.index_cols)
            new = self._manifest_df(
                end if end > 0 else None,
                file_keep=lambda c, f: (c.get("base", self.main_path), c["dir"], f)
                in added,
            )
            old = self._manifest_df(
                start if start > 0 else None,
                file_keep=lambda c, f: (c.get("base", self.main_path), c["dir"], f)
                in removed,
            )
            common = [c for c in new.columns if c in set(old.columns) and c not in keys]
            new_k = new.select(*keys).distinct()
            old_k = old.select(*keys).distinct()
            parts.append(
                new.join(old_k, keys, "left_anti").withColumn(
                    "_change_type", F.lit("insert")
                )
            )
            parts.append(
                old.join(new_k, keys, "left_anti").withColumn(
                    "_change_type", F.lit("delete")
                )
            )
            # keys on both sides: emit a pre/post pair only where some
            # non-key column differs null-safely — rows that merely rode
            # along in the partition rewrite drop out of the feed here
            old_t = old.select(
                *keys, *[F.col(c).alias(f"__pre_{c}") for c in common]
            )
            diff = F.lit(False)
            for c in common:
                diff = diff | ~F.col(c).eqNullSafe(F.col(f"__pre_{c}"))
            changed = (
                new.join(old_t, keys, "inner").where(diff).select(*keys).distinct()
            )
            parts.append(
                old.join(changed, keys, "left_semi").withColumn(
                    "_change_type", F.lit("update_preimage")
                )
            )
            parts.append(
                new.join(changed, keys, "left_semi").withColumn(
                    "_change_type", F.lit("update_postimage")
                )
            )
        else:
            if added:
                parts.append(scan(end, added, "insert"))
            if removed:
                parts.append(scan(start, removed, "delete"))
        # deletion-vector commits added in the window delete rows OUT of
        # files that remain live: surface those rows (visible at start,
        # in kept files, matching a new tombstone key) as row-level
        # deletes — whole-file removals above already cover the rest.
        new_dv = fset(e_commits, "dv") - fset(s_commits, "dv")
        if new_dv and s_set & e_set:
            spark = self._session()
            frames = [
                spark.read.parquet(join_path(base, d, f)) for base, d, f in sorted(new_dv)
            ]
            keys = frames[0]
            for f in frames[1:]:
                keys = keys.unionByName(f)
            # join on the key columns RECORDED in the dv entries — this
            # handle may be a read-only one opened without index_cols
            # (same contract as _dv_frame)
            keysets = {
                tuple(c.get("key_cols") or ())
                for c in e_commits
                if c.get("kind") == "dv"
            }
            if len(keysets) != 1 or keysets == {()}:
                raise RuntimeError(
                    f"table {self.name!r} carries dv commits with inconsistent "
                    f"or missing key_cols: {sorted(keysets)}"
                )
            kept = s_set & e_set
            visible = self._manifest_df(
                start if start > 0 else None,
                file_keep=lambda c, f: (c.get("base", self.main_path), c["dir"], f)
                in kept,
            )
            dv_del = visible.join(
                keys.distinct(), list(keysets.pop()), "left_semi"
            ).withColumn("_change_type", F.lit("delete"))
            parts.append(dv_del)
        if not parts:
            empty = self._manifest_df(end if end > 0 else None, file_keep=lambda c, f: False)
            out = empty.withColumn("_change_type", F.lit("insert"))
        else:
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        return (
            self._apply_policy(out, tombstone_col="_change_type")
            if self.governed
            else out
        )

    def restore(self, version: int) -> None:
        """Roll the table back to an earlier manifest version by
        publishing a NEW version with the old version's commit list
        (manifest mode only) — history stays linear and auditable, the
        bad commits stay inspectable via time travel, and no data is
        copied. Only possible while the target version's data dirs
        survive (i.e. inside the vacuum horizon)."""
        self._assert_ungoverned("restore")
        if self.commit_mode != "manifest":
            raise TypeError("restore() requires commit_mode='manifest'")
        from .manifest import load_manifest, try_commit

        fs = self._fs()
        target = load_manifest(fs, self.main_path, version=version)
        if target is None:
            raise ValueError(f"no manifest version {version}")
        restored_spec = target.get("spec") or next(
            (c["spec"] for c in target["commits"] if c.get("spec")),
            list(self.group_cols),
        )
        while True:
            cur = load_manifest(fs, self.main_path)
            nxt = {
                "version": (cur["version"] if cur else 0) + 1,
                "commits": list(target["commits"]),
                # the restored snapshot's layout comes back with it —
                # without this, reopened instances would fall back to
                # constructor group_cols and partition-targeted writes
                # could run against a different on-disk layout
                "spec": restored_spec,
                "op": f"restore({version})",
            }
            if try_commit(fs, self.main_path, nxt, prev_ts=(cur or {}).get("ts", 0.0)):
                self.group_cols = list(restored_spec)
                return

    def delete_records(self, keys: DataFrame) -> None:
        """Delete every row whose index matches an incoming key — the
        right-to-erasure surface (no reference counterpart; the reference
        can only overwrite whole tables/groups). Grouped tables rewrite
        ONLY the partitions that hold a matched key (one semi-join scan
        locates them, the read-back is partition-pruned), so cost is
        O(matched partitions), not O(table); partitions left empty have
        their directories cleared."""
        if not self.index_cols:
            raise TypeError("delete_records needs index_cols (the reified pandas index)")
        # unhinted joins: a normal erasure batch broadcasts via AQE's own
        # size estimate; a table-sized key set degrades to a shuffle join
        # instead of forcing a broadcast that OOMs the driver
        keyset = keys.select(*self.index_cols).distinct()
        self._delete_matching(
            lambda df: df.join(keyset, self.index_cols, "left_semi"),
            lambda df: df.join(keyset, self.index_cols, "left_anti"),
        )

    def delete_records_dv(self, keys: DataFrame, _txn: str | None = None) -> None:
        """Merge-on-read delete via a DELETION VECTOR (the Delta DV /
        Iceberg position-delete shape, keyed instead of positional): the
        matched keys are written as a tiny tombstone commit
        (``kind='dv'``) and ALL data files stay untouched — no partition
        rewrite, no read-back. Cost is O(deleted keys) however big the
        table; readers pay one (broadcastable) anti-join against the
        (key → latest dv position) frame, applied commit-position-aware
        so rows appended AFTER the delete survive (upsert-after-delete).

        The copy-on-write twin :meth:`delete_records` physically removes
        bytes (the right-to-erasure guarantee); a DV leaves them on disk
        until a rewrite. Compaction/``rewrite_to_canonical``/
        ``replace_all`` materialize the surviving rows, and a full
        STATIC overwrite drops the dv entries; dv entries accumulated
        under dynamic-overwrite maintenance stay in the manifest
        (harmless: every later commit out-positions them) until the next
        static rewrite. NULL key components never match (SQL equality),
        same as the DELETE twin. The append streaming source skips dv
        commits (it surfaces appended data only); the change-data-feed
        (:meth:`stream_changes`) streams them as key-only delete rows.

        Scale shape: the write is one small parquet job + one CAS —
        composing with concurrent appends like any commit. At 100 TB
        this turns "delete 1k users from 10k partitions" from a 10k-
        partition rewrite into a KB-sized commit."""
        self._assert_ungoverned("delete_records_dv")
        if self.commit_mode != "manifest":
            raise TypeError("delete_records_dv needs commit_mode='manifest'")
        if not self.index_cols:
            raise TypeError("delete_records_dv needs index_cols (the match key)")
        import uuid

        from .manifest import DATA_DIR

        keyset = keys.select(*self.index_cols).distinct()
        # tombstones must carry the CANONICAL key types: a caller handing
        # string keys against a bigint column would write a dv whose join
        # silently matches nothing (and whose key-only CDF delete rows
        # crash the arrow batch builder) — cast now, loudly if impossible
        meta = load_meta(self.main_path, spark=self._spark)
        if meta and meta.schema:
            ktypes = {f.name: f.dataType for f in meta.schema.fields}
            have = {f.name: f.dataType for f in keyset.schema.fields}
            differing = [
                c
                for c in self.index_cols
                if c in ktypes and have.get(c) != ktypes[c]
            ]
            if differing:
                # refuse uncastable values explicitly: without ANSI mode a
                # failed cast NULLs silently, and a NULL key component
                # never matches — the match-nothing tombstone this cast
                # exists to prevent. One keys-frame-sized job, only when
                # incoming types actually differ.
                mism = None
                for c in differing:
                    # try_cast: under ANSI a plain cast THROWS mid-job
                    # instead of NULLing — either way we want one clear error
                    cond = (
                        F.col(c).isNotNull()
                        & F.col(c).try_cast(ktypes[c]).isNull()
                    )
                    mism = cond if mism is None else (mism | cond)
                n_bad = keyset.where(mism).count()
                if n_bad:
                    raise TypeError(
                        f"delete_records_dv: {n_bad} key value(s) in "
                        f"{differing} do not cast to the canonical key "
                        "type(s) — a tombstone with NULLed keys would "
                        "silently match nothing"
                    )
            keyset = keyset.select(
                *[
                    F.col(c).try_cast(ktypes[c]).alias(c) if c in ktypes else F.col(c)
                    for c in self.index_cols
                ]
            )
        fs = self._fs()
        rel_dir = f"{DATA_DIR}/{uuid.uuid4().hex[:16]}"
        cdir = join_path(self.main_path, rel_dir)
        keyset.write.mode("overwrite").parquet(cdir)
        files = self._list_commit_rel_files(fs, cdir, rel_dir)
        if not files:
            return
        entry = {
            "dir": rel_dir,
            "files": files,
            "kind": "dv",
            "key_cols": list(self.index_cols),
        }
        if _txn is not None:
            # published under a multi-table transaction: the tombstones
            # take effect only when the txn's decision marker commits
            entry["txn"] = _txn
        self._maybe_spill_files(entry)
        self._publish_entry(
            entry, "append", dynamic=False, op="txn-delete-dv" if _txn else "delete-dv"
        )

    def delete_where_dv(self, condition) -> None:
        """Merge-on-read PREDICATE delete: resolve the predicate against
        the current snapshot (one scan — stats/bloom skipping and
        partition pruning apply), project the matched keys, and commit
        them as a deletion vector exactly like :meth:`delete_records_dv`
        — zero data files rewritten. Rows where the predicate is NULL
        are kept (SQL DELETE semantics). The keyset is fixed at the
        snapshot the scan saw: rows appended concurrently under the same
        keys before this dv lands are tombstoned with it (keyed-dv
        semantics); genuinely new keys are untouched. At 100 TB this is
        "DELETE WHERE ts < retention_horizon" as one pruned scan plus a
        KB-sized commit, instead of a full-table rewrite."""
        self._assert_ungoverned("delete_where_dv")
        if self.commit_mode != "manifest":
            raise TypeError("delete_where_dv needs commit_mode='manifest'")
        if not self.index_cols:
            raise TypeError("delete_where_dv needs index_cols (the match key)")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        # materialize the matched keys ONCE: the emptiness probe and the
        # dv write below otherwise each run the pruned scan (two jobs
        # over the same files); the checkpoint is matched-keys-sized
        matched = (
            self.get_full_df()
            .where(cond)
            .select(*self.index_cols)
            .localCheckpoint(eager=True)
        )
        if matched.isEmpty():
            return
        self.delete_records_dv(matched)

    def delete_where(self, condition) -> None:
        """Delete rows matching a Column predicate; same partition-pruned
        rewrite as :meth:`delete_records` (rows where the predicate is
        NULL are kept, matching SQL DELETE semantics)."""
        self._assert_ungoverned("delete_where")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        self._delete_matching(
            lambda df: df.where(cond),
            lambda df: df.where(~F.coalesce(cond, F.lit(False))),
        )

    def replace_where(self, condition, df: DataFrame) -> None:
        """Delta-style REPLACE WHERE: atomically replace EXACTLY the rows
        matching ``condition`` with ``df``, in ONE committed version —
        delete + insert as separate commits would expose readers to the
        deleted-but-not-yet-reinserted state (and a crash between them
        loses the insert). Every incoming row must satisfy the predicate,
        refused loudly otherwise (a row outside the replaced region would
        make the operation non-idempotent — Delta enforces the same).
        Rows where the predicate is NULL are kept (SQL DELETE semantics).

        Scale shape: touched partitions = (partitions holding a matching
        row) ∪ (partitions of the incoming frame) — only those are read
        back and rewritten; a touched partition whose every row matched
        and got no replacement is PRUNED from the manifest in the same
        CAS, not left stale (the failure mode of building this on plain
        dynamic partition overwrite, which cannot express "overwrite to
        empty"). At 100 TB, "re-land yesterday's partition" is one pruned
        scan plus one partition rewrite."""
        self._assert_ungoverned("replace_where")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        new = self._prepare(df)
        viol = new.where(~F.coalesce(cond, F.lit(False)))
        if not viol.isEmpty():
            raise ValueError(
                f"replace_where: {viol.count()} incoming row(s) do not "
                f"satisfy the predicate {condition!r} — REPLACE WHERE only "
                "writes inside the region it replaces"
            )
        rmw = self._rmw_baseline()
        old = self._snapshot_df(rmw)
        keep_pred = ~F.coalesce(cond, F.lit(False))
        if self.group_cols:
            touched_vals = {
                tuple(r)
                for r in old.where(cond).select(*self.group_cols).distinct().collect()
            } | {
                tuple(r)
                for r in new.select(*self.group_cols).distinct().collect()
            }
            if not touched_vals:
                return
            old_touched = old.where(self._group_filter(touched_vals))
            out = (
                old_touched.where(keep_pred)
                .unionByName(new, allowMissingColumns=True)
                .localCheckpoint(eager=True)
            )
            kept_vals = {
                tuple(r) for r in out.select(*self.group_cols).distinct().collect()
            }
            self._write(
                out, mode="overwrite", dynamic=True, rmw_baseline=rmw,
                prune=touched_vals - kept_vals,
            )
        else:
            out = (
                old.where(keep_pred)
                .unionByName(new, allowMissingColumns=True)
                .localCheckpoint(eager=True)
            )
            self._write(out, mode="overwrite", dynamic=False, rmw_baseline=rmw)

    def _update_exprs(self, assignments: dict, schema) -> dict:
        """Resolve an UPDATE assignment map (column → SQL expr / Column)
        against a snapshot schema: unknown targets fail loudly (a typo'd
        column would otherwise silently no-op), partition group columns
        are rejected (an update that moves a row between partitions is a
        delete+insert — replace_records' semantics, not UPDATE's), and
        every expression is cast to the column's existing type (UPDATE
        never changes a column's type — widening is the maintenance op's
        job)."""
        bad = set(assignments) & set(self.group_cols)
        if bad:
            raise ValueError(
                f"update cannot assign partition group columns: {sorted(bad)}"
                " (a partition move is replace_records' job)"
            )
        known = {f.name: f.dataType for f in schema.fields}
        unknown = set(assignments) - set(known)
        if unknown:
            raise ValueError(f"update targets unknown columns: {sorted(unknown)}")
        return {
            c: (F.expr(e) if isinstance(e, str) else e).cast(known[c])
            for c, e in assignments.items()
        }

    def update_where(self, assignments: dict, condition) -> None:
        """SQL UPDATE, copy-on-write: rows where ``condition`` is TRUE get
        ``assignments`` (column → SQL expr or Column, evaluated against
        the row's OLD values — ``{"qty": "qty * 2"}`` doubles, not
        squares); NULL/FALSE rows are kept unchanged (SQL's
        unknown-is-false rule, matching :meth:`delete_where` and
        :meth:`merge`). No reference counterpart — core.py can only
        overwrite whole tables/groups.

        Scale shape, same as the keyed rewrites: one pruned scan locates
        the partitions holding matched rows, only those are rewritten
        (dynamic partition overwrite), the publish is ONE commit, and the
        whole op is RMW-conflict-protected. Assigning key columns is
        allowed (it cannot create partition moves — group columns are
        rejected) but the caller owns key uniqueness afterwards.

        For the no-rewrite twin see :meth:`update_where_dv`."""
        self._assert_ungoverned("update_where")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        hit = F.coalesce(cond, F.lit(False))
        rmw = self._rmw_baseline()
        old = self._snapshot_df(rmw)
        # assignment validation is driver-only (schema already loaded) —
        # keep it eager; the old up-front isEmpty() probe was one extra
        # JOB per update, and both branches below already terminate on
        # an empty table (empty touched set / empty match probe)
        sets = self._update_exprs(assignments, old.schema)

        def apply(df: DataFrame) -> DataFrame:
            return df.select(
                *[
                    F.when(hit, sets[c]).otherwise(F.col(c)).alias(c)
                    if c in sets
                    else F.col(c)
                    for c in df.columns
                ]
            )

        if self.group_cols:
            # the touched-groups collect doubles as the emptiness probe
            touched_vals = {
                tuple(r)
                for r in old.where(hit).select(*self.group_cols).distinct().collect()
            }
            if not touched_vals:
                return
            out = apply(old.where(self._group_filter(touched_vals)))
            # break lineage: the write target is also the read source
            out = out.localCheckpoint(eager=True)
            # updates never empty a partition (group columns are not
            # assignable), so no prune set rides the commit
            self._write(out, mode="overwrite", dynamic=True, rmw_baseline=rmw)
        else:
            if old.where(hit).isEmpty():
                return
            out = apply(old).localCheckpoint(eager=True)
            self._write(out, mode="overwrite", dynamic=False, rmw_baseline=rmw)

    def update_where_dv(self, assignments: dict, condition) -> None:
        """Merge-on-read UPDATE (the Delta deletion-vector update shape):
        resolve ``condition`` against the current snapshot (one pruned
        scan), tombstone the matched rows' keys as a deletion-vector
        entry, and append the updated images — ZERO existing data files
        rewritten, so cost is O(matched rows) however big the table. At
        100 TB this turns "UPDATE 1k rows across 10k partitions" from a
        10k-partition rewrite into one small parquet job plus a KB-sized
        commit.

        Both entries publish under ONE single-table transaction marker
        (:class:`~.txn.Transaction`): a reader sees the old rows or the
        new rows, never neither (torn delete) nor both (double-count).
        The dv entry sits below the append in commit order, so the fresh
        images survive their own tombstones by the position rule every
        dv read applies. Assignments may rewrite key columns (old keys
        are tombstoned, new images appended under the new keys) — the
        caller owns key uniqueness. Conflicts: the publish is checked
        against the snapshot baseline right before the marker CAS —
        a concurrent commit that added or removed rows this update read
        aborts the txn and raises :class:`ConcurrentWriteError` (the
        check-to-CAS window is documented best-effort, same as every
        optimistic scheme that validates outside the commit point)."""
        self._assert_ungoverned("update_where_dv")
        if self.commit_mode != "manifest":
            raise TypeError("update_where_dv needs commit_mode='manifest'")
        if not self.index_cols:
            raise TypeError("update_where_dv needs index_cols (the match key)")
        from .txn import Transaction

        cond = F.expr(condition) if isinstance(condition, str) else condition
        hit = F.coalesce(cond, F.lit(False))
        rmw = self._rmw_baseline()
        old = self._snapshot_df(rmw)
        sets = self._update_exprs(assignments, old.schema)
        # the matched checkpoint's isEmpty doubles as the emptiness
        # probe — the old up-front isEmpty() was one extra job per update
        matched = old.where(hit).localCheckpoint(eager=True)
        if matched.isEmpty():
            return
        updated = matched.select(
            *[sets.get(c, F.col(c)).alias(c) for c in matched.columns]
        )
        txn = Transaction(join_path(self.main_path, ".txns"))
        txn.delete_records_dv(self, matched.select(*self.index_cols))
        txn.extend(self, updated)
        # optimistic validation against the baseline before the marker
        # flips both entries visible: any commit that landed since this
        # update's snapshot either added rows the update never read or
        # removed rows it would resurrect — abort instead of committing
        from .manifest import effective_commits, load_manifest

        cur = load_manifest(self._fs(), self.main_path) or {"commits": []}
        touched = (
            {
                tuple(r)
                for r in matched.select(*self.group_cols).distinct().collect()
            }
            if self.group_cols
            else set()
        )
        try:
            self._check_rmw_conflict(
                rmw,
                effective_commits(cur["commits"], self.group_cols),
                bool(self.group_cols),
                touched,
            )
        except ConcurrentWriteError:
            txn.abort()
            self.sweep_aborted_txns()
            raise
        txn.commit()

    def _delete_matching(self, match, keep) -> None:
        rmw = self._rmw_baseline()
        old = self._snapshot_df(rmw)
        if self.group_cols:
            # the touched-groups collect doubles as the emptiness probe
            # (an up-front isEmpty() was one extra job per delete)
            touched_vals = {
                tuple(r)
                for r in match(old).select(*self.group_cols).distinct().collect()
            }
            if not touched_vals:
                return
            old_touched = old.where(self._group_filter(touched_vals))
            out = keep(old_touched).localCheckpoint(eager=True)
            kept_vals = {
                tuple(r) for r in out.select(*self.group_cols).distinct().collect()
            }
            # single-commit publish, files + emptied-partition prune in
            # one CAS (see replace_records — also the one-version-per-
            # logical-op CDC invariant). kept_vals empty → the entry has
            # no files and only the prune applies.
            self._write(
                out, mode="overwrite", dynamic=True, rmw_baseline=rmw,
                prune=touched_vals - kept_vals,
            )
        else:
            if old.isEmpty():
                return  # never publish an overwrite commit for a no-op
            out = keep(old).localCheckpoint(eager=True)
            self._write(out, mode="overwrite", dynamic=False, rmw_baseline=rmw)

    # ------------------------------------------------------------- read paths

    def versions(self) -> list[int]:
        """Committed manifest versions available for time travel
        (manifest mode only)."""
        if self.commit_mode != "manifest":
            raise TypeError("versions() requires commit_mode='manifest'")
        from .manifest import list_versions

        return list_versions(self._fs(), self.main_path)

    def version_at(self, ts) -> int:
        """Resolve a wall-clock instant to the manifest version that was
        live then — Delta's ``timestampAsOf`` / Iceberg's AS OF TIMESTAMP
        resolver. ``ts`` is epoch seconds, a ``datetime``, or an ISO-8601
        string (naive strings/datetimes are taken as UTC, the convention
        of every lakehouse AS OF). Raises when the table has no version
        that old (reading "before the table existed" is a caller bug, not
        an empty table)."""
        if self.commit_mode != "manifest":
            raise TypeError("version_at() requires commit_mode='manifest'")
        from .manifest import version_at as _version_at

        v = _version_at(self._fs(), self.main_path, _to_epoch(ts))
        if v is None:
            raise ValueError(
                f"no committed version of {self.name} at or before {ts!r}"
            )
        return v

    def count_rows(self) -> int:
        """Table row count, METADATA-ONLY when possible: stats-collecting
        manifest tables record per-file rowcounts at commit time (free —
        the same grouped aggregate that collects [min,max]), so the count
        is a driver-side sum over the manifest, zero files opened — the
        O(1)-jobs answer a 100 TB "how many rows" deserves. Falls back
        to a real count when any commit predates rowcounts, a deletion
        vector is live (tombstones subtract data-dependently), or the
        table is not in manifest mode. A governed handle under a row
        filter counts the GOVERNED frame (the metadata total would
        disclose how many rows the filter hides); mask-only policies
        keep the metadata path (masks never change the count)."""
        if self.governed and self._policy().get("row_filter"):
            return self.get_full_df().count()
        if self.commit_mode == "manifest":
            from .manifest import effective_commits, load_manifest

            mf = load_manifest(self._fs(), self.main_path)
            commits = effective_commits((mf or {}).get("commits", []), self.group_cols)
            data = [c for c in commits if c.get("kind") != "dv"]
            if not any(c.get("kind") == "dv" for c in commits) and all(
                not c["files"] or set(c.get("rows", {})) >= set(c["files"])
                for c in data
            ):
                return sum(
                    c["rows"][f] for c in data for f in c["files"] if c.get("rows")
                )
        return self.get_full_df().count()

    def column_minmax(self, col: str) -> tuple:
        """(min, max) of ``col``, METADATA-ONLY when the manifest can
        prove them: stats-collecting tables record per-file [min, max] at
        commit time, so the table-level extremes are a driver-side fold
        over the manifest — zero files opened, the Iceberg
        scan-free-aggregate shape. Falls back to a real scan when any
        live data file lacks recorded stats for ``col`` or a deletion
        vector is live (tombstoned rows could BE the extremes — the
        recorded file stats can no longer prove table-level bounds).
        Governed handles take the scan path whenever a policy is active
        (the manifest's extremes are RAW — a mask or row filter changes
        the governed answer); the scan itself reads governed rows."""
        if (
            self.commit_mode == "manifest"
            and col in self.stats_cols
            and not (self.governed and self._policy())
        ):
            from .manifest import effective_commits, load_manifest

            mf = load_manifest(self._fs(), self.main_path)
            commits = effective_commits((mf or {}).get("commits", []), self.group_cols)
            data = [c for c in commits if c.get("kind") != "dv"]
            no_dv = not any(c.get("kind") == "dv" for c in commits)
            covered = all(
                col in ((c.get("stats") or {}).get(f) or {})
                for c in data
                for f in c["files"]
            )
            if no_dv and covered:
                lo = hi = None
                for c in data:
                    for f in c["files"]:
                        mn, mx = c["stats"][f][col]
                        if mn is None:  # zero-row file: no contribution
                            continue
                        lo = mn if lo is None or mn < lo else lo
                        hi = mx if hi is None or mx > hi else hi
                return (lo, hi)
        r = self.get_full_df().agg(
            F.min(F.col(col)).alias("mn"), F.max(F.col(col)).alias("mx")
        ).collect()[0]
        return (r["mn"], r["mx"])

    def tag(self, name: str, version: int | None = None) -> None:
        """Pin a snapshot under a NAME (Iceberg tag shape): ``tag('v-prod')``
        records the current (or given) version in
        ``_pqrs_manifest/tags/<name>.json``. A tagged version — its
        manifest, its spilled file lists, and every data dir it
        references — is RETAINED by vacuum regardless of
        ``keep_versions``, so a tag is the durable reproducibility pin
        ("the exact corpus snapshot run X trained on") that plain time
        travel loses at the vacuum horizon. Re-tagging a name moves it
        (last-write-wins; tags are refs, not commits)."""
        self._assert_ungoverned("tag")
        if self.commit_mode != "manifest":
            raise TypeError("tag() requires commit_mode='manifest'")
        if not name or "/" in name or name.startswith((".", "_")):
            # dot/underscore prefixes are hidden from the fs shim's
            # listings (the staging/metadata namespace) — a tag named that
            # way would write fine and then never list
            raise ValueError(f"bad tag name: {name!r}")
        if version is None:
            vs = self.versions()
            if not vs:
                raise ValueError("cannot tag an empty table (no committed version)")
            version = vs[-1]
        elif version not in self.versions():
            raise KeyError(f"no manifest version {version} for {self.name}")
        import json as _json

        from .manifest import MANIFEST_DIR

        self._fs().write_text_atomic(
            join_path(self.main_path, MANIFEST_DIR, "tags", f"{name}.json"),
            _json.dumps({"version": int(version)}),
        )

    def tags(self) -> dict[str, int]:
        """name → pinned version for every tag on the table."""
        if self.commit_mode != "manifest":
            raise TypeError("tags() requires commit_mode='manifest'")
        import json as _json

        from .manifest import MANIFEST_DIR

        fs = self._fs()
        tdir = join_path(self.main_path, MANIFEST_DIR, "tags")
        out = {}
        for p in fs.list_names(tdir, ".json"):
            name = p.rsplit("/", 1)[-1][: -len(".json")]
            out[name] = int(_json.loads(fs.read_text(join_path(tdir, f"{name}.json")))["version"])
        return out

    def delete_tag(self, name: str) -> None:
        """Remove a tag; the pinned version becomes vacuumable again."""
        self._assert_ungoverned("delete_tag")
        if self.commit_mode != "manifest":
            raise TypeError("delete_tag() requires commit_mode='manifest'")
        from .manifest import MANIFEST_DIR

        self._fs().delete(join_path(self.main_path, MANIFEST_DIR, "tags", f"{name}.json"))

    def get_tagged_df(self, name: str) -> DataFrame:
        """The snapshot a tag pins — ``get_full_df(version=tags()[name])``."""
        t = self.tags()
        if name not in t:
            raise KeyError(f"no tag {name!r} on {self.name}")
        return self.get_full_df(version=t[name])

    def history(self) -> list[dict]:
        """The table's operation log (manifest mode only) — one entry per
        committed version: operation kind, partition spec, live commit /
        file counts. The lakehouse audit surface: every mutation is a
        manifest version, so the full history is a driver-side read of
        the (tiny) manifest JSONs — no data files touched."""
        if self.commit_mode != "manifest":
            raise TypeError("history() requires commit_mode='manifest'")
        from .manifest import load_manifest

        fs = self._fs()
        out = []
        for v in self.versions():
            mf = load_manifest(fs, self.main_path, version=v)
            if mf is None:
                # vacuumed between the listing and this read — skip, the
                # remaining versions still form a valid (gappy) log
                continue
            out.append(
                {
                    "version": v,
                    "op": mf.get("op", "?"),
                    "ts": mf.get("ts"),
                    "spec": mf.get("spec"),
                    # the schema epoch current at publish (None predates
                    # the stamp) — the snapshot↔schema binding, surfaced
                    # so an operator can see exactly when each DDL took
                    # effect relative to the data history
                    "schema_v": mf.get("schema_v"),
                    "n_commits": len(mf["commits"]),
                    "n_files": sum(len(c["files"]) for c in mf["commits"]),
                }
            )
        return out

    def _manifest_df(
        self,
        version: int | None,
        ignore_corrupt_files: bool = False,
        file_keep=None,
        project=None,
        preloaded: dict | None = None,
        snapshot_schema: bool = False,
    ) -> DataFrame:
        """Manifest-mode scan: the file list comes from one manifest (the
        snapshot), frozen at plan time — concurrent commits cannot change
        a running query, and nothing ever lists directories. Each commit
        dir anchors its own partition-column discovery (basePath), and the
        per-commit scans union into one plan (commit count is bounded by
        compaction, which collapses the table to a single commit).

        Deletion-vector commits (``kind='dv'``, see
        :meth:`delete_records_dv`) never scan as data: their key files
        aggregate into one (key → latest dv position) frame, and each
        data scan anti-joins it with the merge-on-read rule *a row is
        dead iff some dv BELOW it in the commit list matches its key* —
        so data appended after a delete (upsert-after-delete) survives.
        The filter is applied per scan, before the ``project`` hook
        (the hook may drop key columns)."""
        from .manifest import load_manifest

        spark = self._session()
        meta = load_meta(self.main_path, spark=self._spark)
        # a read-modify-write op passes the manifest its baseline already
        # loaded (``preloaded``) — the snapshot it checks conflicts
        # against MUST be the one it read, and the duplicate JSON load
        # per keyed write goes away
        mf = (
            preloaded
            if preloaded is not None
            else load_manifest(self._fs(), self.main_path, version)
        )
        if version is not None and mf is None:
            raise KeyError(f"no manifest version {version} for {self.name}")
        schema = meta.schema if meta and meta.schema else None
        from .schema_log import load_schema_log, schema_of_fields

        slog = load_schema_log(self._fs(), self.main_path)
        epochs = {e["v"]: e for e in slog}
        cur_epoch = slog[-1] if slog else None
        if snapshot_schema and mf is not None and cur_epoch is not None:
            # snapshot↔schema binding (Iceberg semantics): a time-travel
            # read uses the epoch that was CURRENT when the version
            # published — a column renamed/added/dropped later reads back
            # exactly as it did then. Manifests predating the stamp fall
            # back to the max epoch any of their commits was written
            # under — exact for versions published before ALL DDL (epoch
            # 1 IS the pre-DDL snapshot), a sound lower bound for
            # old-engine manifests in between.
            sv = mf.get("schema_v")
            if sv is None:
                sv = max(
                    (c.get("schema_v", 1) for c in mf.get("commits", [])),
                    default=None,
                )
            if sv is not None and sv in epochs:
                cur_epoch = epochs[sv]
        if cur_epoch is not None:
            # the schema LOG is the authority once DDL has happened; the
            # sidecar is just its cache (a racing writer may have saved a
            # stale cache after our DDL — the log, being CAS-published,
            # cannot regress)
            from ..plans.schema import as_nullable

            schema = as_nullable(schema_of_fields(cur_epoch["fields"]))
        from .manifest import effective_commits

        # multi-table-txn gate: entries published under a still-pending
        # (or aborted) transaction are not part of any read snapshot —
        # filtering whole entries keeps the dv position arithmetic below
        # intact (relative order of the survivors is unchanged). The
        # effective view also applies committed txn-overwrite masks
        # (deferred prune) — both consumers of the list (scan loop and
        # _dv_frame) see the SAME filtered ordering.
        commits = effective_commits((mf or {}).get("commits", []), self.group_cols)
        dv = self._dv_frame(commits)
        scans = []
        for ci, c in enumerate(commits):
            if c.get("kind") == "dv":
                continue
            cfiles = (
                c["files"]
                if file_keep is None
                else [f for f in c["files"] if file_keep(c, f)]
            )
            if not cfiles:
                continue
            cdir = join_path(c.get("base", self.main_path), c["dir"])
            # unstamped commits predate ALL DDL (stamping ships with the
            # DDL feature), so they were written under the bootstrap
            # epoch's names — epoch 1 IS that pre-DDL snapshot
            cv = c.get("schema_v", 1 if c.get("kind") != "dv" else None)
            emap = None
            if cur_epoch is not None and cv is not None and cv != cur_epoch["v"]:
                if cv not in epochs:
                    raise RuntimeError(
                        f"commit {c['dir']!r} of {self.name!r} is stamped with "
                        f"schema epoch {cv} but the schema log has no such "
                        "version — was _pqrs_schema/ copied with the data?"
                    )
                emap = epochs[cv]
            r = spark.read
            if emap is not None:
                # a commit from an OLDER schema epoch: open it with the
                # names/types it was WRITTEN under, then map to the
                # current epoch by field id below (rename → alias,
                # widen → cast, added-later → typed null) — the Iceberg
                # field-id / Delta column-mapping read path, per commit
                from ..plans.schema import as_nullable

                r = r.schema(as_nullable(schema_of_fields(emap["fields"])))
            elif schema is not None:
                r = r.schema(schema)
            if ignore_corrupt_files:
                r = r.option("ignoreCorruptFiles", "true")
            s = r.option("basePath", cdir).parquet(*[join_path(cdir, f) for f in cfiles])
            if emap is not None:
                by_id = {f["id"]: f for f in emap["fields"]}
                cols = []
                for f in cur_epoch["fields"]:
                    src = by_id.get(f["id"])
                    tgt = schema_of_fields([f]).fields[0].dataType
                    if src is None:
                        # rows predating the column: its initial default
                        # (or null) — a constant per commit scan, folded
                        # by Catalyst, never materialized in storage
                        cols.append(F.lit(f.get("default")).cast(tgt).alias(f["name"]))
                    elif src == f:
                        # deep entry equality (ids included) — name+type
                        # alone would miss a drop-then-readd that
                        # reproduced the same type json under a new id
                        cols.append(F.col(f["name"]))
                    else:
                        # rename/widen/nested-evolution mapping, struct-aware
                        cols.append(self._epoch_field_expr(src, f, tgt, slog))
                if project is not None:
                    # keep the metadata struct reachable for the hook —
                    # it resolves only directly on the scan
                    cols.append(F.col("_metadata"))
                s = s.select(*cols)
            if dv is not None:
                keys, tomb = dv
                if project is not None and emap is None:
                    # metadata columns resolve only directly on a scan —
                    # materialize the struct as a regular column so the
                    # project hook still sees _metadata after the join
                    s = s.withColumn("_metadata", F.col("_metadata"))
                s = s.join(tomb, keys, "left").where(
                    F.col(_DV_POS).isNull() | (F.col(_DV_POS) <= F.lit(ci))
                ).drop(_DV_POS)
            if project is not None:
                # per-scan projection BEFORE the union — the hook for
                # metadata columns (_metadata does not survive Union)
                s = project(s)
            scans.append(s)
        if not scans:
            return spark.createDataFrame([], schema or T.StructType([]))
        out = scans[0]
        for s in scans[1:]:
            out = out.unionByName(s, allowMissingColumns=True)
        return out

    def _dv_frame(self, commits: list[dict]):
        """(key → max dv commit position) over every deletion-vector
        entry, or None when the manifest carries no DVs (the zero-cost
        common case). The frame is tombstone-keys-sized — bounded by
        deletes since the last compaction, not by the table."""
        dvs = [(i, c) for i, c in enumerate(commits) if c.get("kind") == "dv"]
        if not dvs:
            return None
        # join on the key columns RECORDED in the dv entries, not this
        # handle's index_cols: a read-only handle opened without (or with
        # different) index_cols must still apply the tombstones the
        # writer committed
        keysets = {tuple(c.get("key_cols") or ()) for _, c in dvs}
        if len(keysets) != 1 or keysets == {()}:
            raise RuntimeError(
                f"table {self.name!r} carries dv commits with inconsistent or "
                f"missing key_cols: {sorted(keysets)}"
            )
        # memoize the folded frame per handle, CONTENT-keyed on exactly
        # what it derives from: each dv entry's position, dir and file
        # list. A multi-read lifecycle (changes_between plans 2-3 scans,
        # a refresh re-reads source and dest, serve paths re-read probed
        # partitions) otherwise pays the union+groupBy+localCheckpoint
        # JOB once per read of an unchanged tombstone set (guide §1.2:
        # jobs that don't need to exist). Content keying is sound under
        # concurrent writers AND txn-marker flips — any change to the
        # effective dv entries changes the key; an unchanged key always
        # folds to the identical frame.
        memo_key = tuple(
            (i, c.get("base"), c["dir"], tuple(c["files"])) for i, c in dvs
        )
        cached = self._dv_memo.get(memo_key)
        if cached is not None:
            return cached
        keys = list(keysets.pop())
        spark = self._session()
        frames = []
        for i, c in dvs:
            cdir = join_path(c.get("base", self.main_path), c["dir"])
            f = spark.read.parquet(*[join_path(cdir, x) for x in c["files"]])
            frames.append(f.withColumn(_DV_POS, F.lit(i)))
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        folded = out.groupBy(*keys).agg(F.max(_DV_POS).alias(_DV_POS))
        # materialize ONCE: _manifest_df joins this frame into EVERY
        # per-commit scan branch of its union — without the checkpoint
        # the dv union+groupBy subtree re-executes O(live commits) times
        # per read (invisible at test scale, 50× on a 50-commit table).
        # localCheckpoint is tombstone-keys-sized (bounded by deletes
        # since the last compaction), so the eager job is tiny.
        out = keys, folded.localCheckpoint(eager=True)
        if len(self._dv_memo) >= 16:  # bound handle-lifetime growth
            self._dv_memo.pop(next(iter(self._dv_memo)))
        self._dv_memo[memo_key] = out
        return out

    def get_full_df(
        self,
        version: int | None = None,
        ignore_corrupt_files: bool = False,
        as_of=None,
        bind_snapshot_schema: bool = True,
    ) -> DataFrame:
        """Full scan — on a GOVERNED handle the persisted policy (column
        masks, then row filter) is applied before the frame is returned;
        every read surface built on this one (partition reads, views,
        map_partitions, SQL) inherits it. ``bind_snapshot_schema=False``
        makes a versioned read keep the CURRENT epoch's shape (the
        pre-round-6 behavior) — for consumers whose downstream
        expressions speak current names (matview rescans, governed-by-
        call reads). See :meth:`_get_full_df_raw` for the scan
        contract."""
        df = self._get_full_df_raw(
            version, ignore_corrupt_files, as_of,
            bind_snapshot_schema=bind_snapshot_schema,
        )
        if self.governed:
            df = self._apply_policy(df)
        return df

    def _get_full_df_raw(
        self,
        version: int | None = None,
        ignore_corrupt_files: bool = False,
        as_of=None,
        bind_snapshot_schema: bool = True,
    ) -> DataFrame:
        """Full scan (reference ``get_full_df``, core.py:169-175); empty
        canonical-schema frame when no files exist (core.py:175).
        ``version`` (manifest mode only) time-travels to an earlier
        committed snapshot. ``ignore_corrupt_files=True`` is the
        disaster-recovery read: unreadable parquet files are skipped
        instead of failing the scan (per-read option, never a session
        conf — nothing leaks to concurrent readers), surfacing whatever
        rows survive so a partial restore can proceed; the default read
        fails loudly, as it should.

        With a canonical sidecar schema the scan is opened with that schema
        explicitly: no footer-merging pass over every file (``mergeSchema``
        reads ALL footers — an O(files) driver cost at 100 TB), no session
        conf mutation for partition-type inference (the explicit schema
        types the partition columns), and files predating a widening simply
        surface typed nulls for the newer columns — the standard parquet
        schema-evolution read path.

        ``as_of`` (manifest mode; epoch seconds, datetime, or ISO-8601
        string) time-travels by TIMESTAMP instead of version number —
        resolved through :meth:`version_at` against each manifest's
        publish stamp. Mutually exclusive with ``version``."""
        if as_of is not None:
            if version is not None:
                raise TypeError("pass version= or as_of=, not both")
            version = self.version_at(as_of)
        if self.commit_mode == "manifest":
            # time travel binds to the SNAPSHOT's schema epoch (Iceberg
            # semantics; pre-stamp versions keep current-schema mapping) —
            # except on governed handles: the policy's masks/filter speak
            # the CURRENT schema, so a governed time travel keeps the
            # current shape rather than surfacing pre-rename raw columns
            # the policy could not have named (fail-closed)
            return self._manifest_df(
                version,
                ignore_corrupt_files,
                snapshot_schema=(
                    bind_snapshot_schema
                    and version is not None
                    and not self.governed
                ),
            )
        if version is not None:
            raise TypeError("time travel requires commit_mode='manifest'")
        spark = self._session()
        meta = load_meta(self.main_path, spark=self._spark)
        if meta and meta.schema:
            # emptiness check via an early-exit probe, not a full listing:
            # a recursive list of a large table is O(files) driver-side
            # RPC on an object store, and this runs on EVERY read
            if not self._fs().has_any_file(self.main_path, ".parquet"):
                return spark.createDataFrame([], meta.schema)
            r = spark.read.schema(meta.schema)
            if ignore_corrupt_files:
                r = r.option("ignoreCorruptFiles", "true")
            return r.parquet(self.main_path)
        if not self._live_paths():
            return spark.createDataFrame([], T.StructType([]))
        # no sidecar (externally-written table): build the schema without
        # touching session conf (a set/restore would race concurrent
        # threads on the shared session) and without lossy partition-value
        # inference ('01' and '1' collapse as ints). Listing the leaf
        # FILES disables partition discovery, so the footer merge yields
        # the pure data schema; partition columns come from the directory
        # names, typed string.
        files = self._live_paths()
        base_r = spark.read
        if ignore_corrupt_files:
            base_r = base_r.option("ignoreCorruptFiles", "true")
        merged = base_r.option("mergeSchema", "true").parquet(*files).schema
        known = set(merged.fieldNames())
        part_fields = [
            T.StructField(part.split("=", 1)[0], T.StringType())
            for part in path_parts(files[0])[len(path_parts(self.main_path)):-1]
            if "=" in part and part.split("=", 1)[0] not in known
        ]
        schema = T.StructType(list(merged.fields) + part_fields)
        r2 = spark.read.schema(schema)
        if ignore_corrupt_files:
            r2 = r2.option("ignoreCorruptFiles", "true")
        return r2.parquet(self.main_path)

    def get_partition_df(self, value: Any, partition_col: str | None = None) -> DataFrame:
        """Partition-pruned read (reference core.py:177-194): Catalyst prunes
        the scan to the matching directories — no data outside the partition
        is touched, same as the reference's path-component filtering."""
        pc = partition_col or (self.group_cols[0] if self.group_cols else None)
        if pc is None:
            raise TypeError("not a grouped table")
        return self.get_full_df().where(F.col(pc) == value)

    def partition_values(self, partition_col: str | None = None) -> list[Any]:
        """DISTINCT values of a partition column, METADATA-ONLY when
        possible: the values are encoded in every data file's hive path,
        which the manifest (manifest mode — zero listings, zero opens)
        or one directory listing (files mode) already knows. This is the
        first discovery call an interactive user makes on a 100 TB
        table; a distinct scan for it would read the whole table. Falls
        back to the scan for non-partition columns, when any live file
        predates the current spec (mixed partition specs), when a
        deletion vector is live (tombstones may have emptied a
        partition the paths still show), on governed handles with an
        active policy (a row filter may hide whole partitions, a mask
        may rewrite the column), and for value types the hive path
        cannot round-trip."""
        pc = partition_col or self.group_cols[0]
        if (
            pc in self.group_cols
            and not (self.governed and self._policy())
            and not self._has_live_dv()
        ):
            vals = self._partition_values_meta(pc)
            if vals is not None:
                return vals
        return [r[0] for r in self.get_full_df().select(pc).distinct().collect()]

    def _has_live_dv(self) -> bool:
        if self.commit_mode != "manifest":
            return False
        from .manifest import effective_commits, load_manifest

        mf = load_manifest(self._fs(), self.main_path)
        return any(
            c.get("kind") == "dv"
            for c in effective_commits((mf or {}).get("commits", []), self.group_cols)
        )

    def _partition_values_meta(self, pc: str) -> list | None:
        """Parse ``pc=value`` from every live data-file path and cast to
        the canonical column type driver-side. None ⇒ the caller falls
        back to the scan (a file not carrying the column, a null
        partition dir, or an un-castable value/type)."""
        paths = self._live_paths()
        if not paths:
            return []
        token = pc + "="
        raw = set()
        for p in paths:
            v = None
            for part in p.split("/")[:-1]:
                if part.startswith(token):
                    v = part[len(token):]
            if v is None or v == "__HIVE_DEFAULT_PARTITION__":
                return None
            raw.add(v)
        from urllib.parse import unquote

        vals = {unquote(s) for s in raw}
        meta = load_meta(self.main_path, spark=self._spark)
        dtype = None
        if meta and meta.schema:
            for f in meta.schema.fields:
                if f.name == pc:
                    dtype = f.dataType
        return _cast_partition_strings(sorted(vals), dtype)

    def read_df_from_path(self, path: str) -> DataFrame:
        """Single-file read with partition columns restored from the
        directory names (reference ``read_df_from_path``, core.py:225-228;
        group-col rematerialization core.py:216-223)."""
        df = self._session().read.option("basePath", self._scan_base(path)).parquet(path)
        return self._apply_policy(df) if self.governed else df

    # Arrow-table variants (reference returns pyarrow.Table from
    # ``get_full_table`` core.py:172-175, ``get_partition_table``
    # core.py:185-189, ``read_table_from_path`` core.py:203-214, ``tables``
    # core.py:275-277). These collect to the driver by definition — same as
    # the reference, which is single-process; scale reads stay on
    # ``get_full_df``.

    def get_full_table(self):
        return self.get_full_df().toArrow()

    def get_partition_table(self, value: Any, partition_col: str | None = None):
        return self.get_partition_df(value, partition_col).toArrow()

    def read_table_from_path(self, path: str):
        return self.read_df_from_path(path).toArrow()

    @property
    def tables(self):
        """Per-data-file Arrow tables (reference ``tables``, core.py:275-277)."""
        return (df.toArrow() for df in self.dfs)

    # ------------------------------------------------- batch writer factories
    # (reference core.py:230-243 — buffered appenders/upserters)

    def get_extending_dict_batch_writer(self, max_records: int = 1_000_000):
        from .writers import RecordWriter

        return RecordWriter(self, record_limit=max_records)

    def get_extending_fixed_dict_batch_writer(
        self, schema: T.StructType | list[str], max_records: int = 1_000_000
    ):
        """First argument is a Spark ``StructType`` or a reference-style
        list of column names (reference passes ``cols``, core.py:233)."""
        from .writers import FixedRecordWriter

        if isinstance(schema, T.StructType):
            return FixedRecordWriter(self, schema=schema, record_limit=max_records)
        return FixedRecordWriter(self, cols=list(schema), record_limit=max_records)

    def get_extending_df_batch_writer(self, max_records: int = 1_000_000):
        from .writers import DfBatchWriter

        return DfBatchWriter(self, record_limit=max_records)

    def get_replacing_dict_batch_writer(self, max_records: int = 1_000_000):
        from .writers import RecordWriter

        return RecordWriter(self, record_limit=max_records, replace=True)

    def get_replacing_df_batch_writer(self, max_records: int = 1_000_000):
        from .writers import DfBatchWriter

        return DfBatchWriter(self, record_limit=max_records, replace=True)

    # ---------------------------------------------------------------- compute

    def map_partitions(
        self,
        fun: Callable,
        schema: T.StructType | str | None = None,
        level: str | None = None,
    ) -> DataFrame | list:
        """Per-partition pandas apply (reference core.py:138-151).

        The reference groups *file paths* by directory level and fans a
        pandas function over them with a worker pool; the Spark shape is
        ``groupBy(partition cols).applyInPandas`` — same grouping, but the
        shuffle/execution is handled by the engine and scales past one node.
        ``level=g`` narrows the grouping to one partition column
        (core.py:146-147).

        With a ``schema``, ``fun`` must return a pandas DataFrame and the
        result is a distributed DataFrame. Without one, ``fun`` may return
        ANY picklable value (the reference's list-returning mode — scalar
        payloads like ``len`` at tests/test_parallel.py:74-83): each
        group's result is computed on executors, pickled into a one-row
        binary frame, and collected as a plain list. The collect is a list
        of per-GROUP results (partition-count-sized, not data-sized), so it
        stays driver-safe at scale as long as the per-group payloads are
        small — same contract as the reference's worker-pool return."""
        if not self.group_cols:
            raise TypeError("not a grouped table")  # core.py:337-338
        cols = [level] if level else list(self.group_cols)
        grouped = self.get_full_df().groupBy(*cols)
        if schema is not None:
            return grouped.applyInPandas(fun, schema)

        import pickle

        import pandas as pd

        def _wrap(pdf):
            return pd.DataFrame({"r": [pickle.dumps(fun(pdf))]})

        rows = grouped.applyInPandas(_wrap, "r binary").collect()
        return [pickle.loads(r["r"]) for r in rows]

    def stream(self, max_files_per_trigger: int | None = None) -> DataFrame:
        """The table as a STREAMING source: a file stream over the repo
        root with the sidecar canonical schema (file sources require an
        explicit schema — the sidecar is exactly that). New files appended
        by other writers become micro-batches; ``max_files_per_trigger``
        bounds batch size. This is the read side of the streaming story
        whose write side is ``stream_into_repo`` — two repos and two
        streams form a pipeline stage. Not supported in manifest mode
        (file-stream discovery is directory-based; manifest visibility
        isn't), which raises rather than silently reading uncommitted
        data dirs."""
        if self.commit_mode == "manifest":
            raise TypeError(
                "stream() reads by directory listing; manifest-mode visibility "
                "is the manifest, not the directory — use stream_manifest()"
            )
        meta = load_meta(self.main_path, spark=self._spark)
        if meta is None or meta.schema is None:
            raise TypeError("stream() needs the sidecar schema (write once first)")
        r = self._session().readStream.schema(meta.schema)
        if max_files_per_trigger:
            r = r.option("maxFilesPerTrigger", max_files_per_trigger)
        df = r.parquet(self.main_path)
        # policy folds into the streaming plan as plain Column ops; it is
        # captured at stream DEFINITION time — policy changes need a
        # stream restart, same contract as a schema change
        return self._apply_policy(df) if self.governed else df

    def _stream_px_auto(
        self, partitioned, threshold_rows: int = 100_000, threshold_files: int = 32
    ) -> bool:
        """Resolve a stream's reader flavor. Explicit True/False wins;
        ``None`` = AUTO: pick the executor-side partitioned reader
        (``pqrs_manifest_stream_px`` — one task per file, Arrow batches
        off the scan) as soon as any single committed entry is FAT —
        ≥ ``threshold_rows`` recorded rows, or ≥ ``threshold_files``
        files when the entry predates rowcounts. The simple reader
        materializes each micro-batch's rows ON THE DRIVER, which is
        right for control-plane-sized increments and a bottleneck for
        anything else; at 100× one fat commit through it is a driver
        OOM, so fat history flips the default before the stream ever
        polls. The probe is O(manifest) driver-side JSON already cached
        by every other manifest op."""
        if partitioned is not None:
            return bool(partitioned)
        from .manifest import load_manifest

        mf = load_manifest(self._fs(), self.main_path)
        for c in (mf or {}).get("commits", []):
            rows = c.get("rows")
            if rows:
                if sum(rows.values()) >= threshold_rows:
                    return True
            elif len(c.get("files", ())) >= threshold_files:
                return True
        return False

    def stream_manifest(
        self,
        partitioned: bool | None = None,
        predicates=None,
        hold: str | None = None,
    ) -> DataFrame:
        """The table as a streaming source in MANIFEST mode — offsets are
        manifest VERSIONS, each micro-batch is the rows of files added
        between two committed versions, and replay re-derives identical
        batches from the immutable manifest JSONs (exactly-once by
        construction; see sources/manifest_stream.py for the
        append/overwrite/vacuum contract). The streaming read side of the
        commit protocol whose write side is ``extend_fenced``.
        ``partitioned=True`` selects the executor-side flavor: one Spark
        task per added file, Arrow batches off the scan — the scale path
        for fat commits (the simple reader prefetches each batch
        driver-side, right for control-plane-sized increments). The
        default (``None``) AUTO-selects: fat committed entries (row
        counts from the manifest) flip to the partitioned reader — see
        :meth:`_stream_px_auto`.
        ``predicates`` (same spec as :meth:`get_full_df_skipping`) turns
        the stream into a stats-pruned SUBSCRIPTION: files whose manifest
        [min,max] provably cannot match never enter a micro-batch —
        FILE-level pruning only (a surviving file streams whole); apply
        the exact row filter downstream. The CDC-of-a-keyspace-slice
        shape: a consumer tracking one tenant/key range reads a fraction
        of each commit instead of the whole feed."""
        if self.commit_mode != "manifest":
            raise TypeError("stream_manifest() requires commit_mode='manifest'")
        meta = load_meta(self.main_path, spark=self._spark)
        schema = meta.schema if meta and meta.schema else self.get_full_df().schema
        if not schema.fields:
            raise TypeError("stream_manifest() needs a committed schema (write once first)")
        from .manifest_stream import register_manifest_stream

        spark = self._session()
        register_manifest_stream(spark)
        r = (
            spark.readStream.format(
                "pqrs_manifest_stream_px"
                if self._stream_px_auto(partitioned)
                else "pqrs_manifest_stream"
            )
        )
        if hold:
            # named retention hold: every committed micro-batch advances
            # it, so vacuum() cannot prune this checkpoint's horizon —
            # see register_retention_hold. Same name rule as there,
            # checked EAGERLY (the reader re-checks at construction): a
            # '/' or leading '.' would write the marker outside the
            # holds dir, invisibly to _held_versions
            if "/" in hold or hold.startswith("."):
                raise ValueError(f"bad hold name {hold!r}")
            r = r.option("retention_hold", hold)
        if predicates is not None:
            import json as _json

            from .manifest import norm_predicates

            preds = norm_predicates(predicates)
            if self.governed:
                # same leak the batch skipping path guards: pruning by a
                # masked column's RAW min/max would disclose raw-value
                # membership through which files stream — and the stream
                # never re-applies predicates row-level, so the predicate
                # cannot be evaluated over governed values either. Only
                # unmasked-column predicates may prune (their values are
                # identical pre/post policy; the row filter only shrinks
                # the row set, so pruning stays superset-safe).
                # top segments: a NESTED mask under a column pins its
                # whole top column against raw-stats pruning too
                masked = {
                    k.split(".")[0]
                    for k in (self._policy().get("column_masks") or {})
                }
                if masked:
                    preds = [p for p in preds if p[0] not in masked]
            r = r.option("skip_preds", _json.dumps(preds))
        df = (
            r.option("root", self.main_path)
            .option("schema_ddl", ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields))
            .option("schema_json", schema.json())
            .option("cols", ",".join(f.name for f in schema.fields))
            .option("col_types", ",".join(f.dataType.simpleString() for f in schema.fields))
            .load()
        )
        return self._apply_policy(df) if self.governed else df

    def stream_versions(self) -> DataFrame:
        """The manifest LOG itself as a streaming source (manifest mode):
        one row per committed version — ``_version, _ts, _op,
        _n_commits, _n_files`` (snapshot totals) and ``_files_added``
        (the version's own contribution, dv key files included) —
        derived from the version JSONs alone;
        no data file is ever opened. Offsets, replay, and the
        undecided-txn frontier follow the same rules as the data feeds
        (sources/manifest_stream.py). Two consumers: an audit/ops feed
        (who committed what, when, at what file-count cadence), and the
        metadata-weight trigger behind
        :meth:`~parquetranger_spark.sources.matview.MaterializedAggView.refresh_stream`
        — a view pump that must NOT pay a data-row stream just to learn
        a version landed."""
        # per-version file counts + op cadence are physical metadata a
        # governed consumer has no business watching (ops hold owner
        # handles) — same perimeter as stats/files_df
        self._refuse_leaky_metadata("stream_versions")
        if self.commit_mode != "manifest":
            raise TypeError("stream_versions() requires commit_mode='manifest'")
        from .manifest_stream import register_manifest_stream

        spark = self._session()
        register_manifest_stream(spark)
        cols = ["_version", "_ts", "_op", "_n_commits", "_n_files", "_files_added"]
        types = ["bigint", "double", "string", "int", "int", "int"]
        from pyspark.sql.types import _parse_datatype_string

        meta_schema = _parse_datatype_string(
            ", ".join(f"{c} {t}" for c, t in zip(cols, types))
        )
        return (
            spark.readStream.format("pqrs_manifest_stream")
            .option("root", self.main_path)
            .option("versions_meta", "1")
            .option("schema_ddl", ", ".join(f"{c} {t}" for c, t in zip(cols, types)))
            .option("schema_json", meta_schema.json())
            .option("cols", ",".join(cols))
            .option("col_types", ",".join(types))
            .load()
        )

    def stream_changes(
        self,
        partitioned: bool | None = None,
        starting_version: int | str = 1,
        hold: str | None = None,
    ) -> DataFrame:
        """The table's CHANGE-DATA-FEED as a streaming source (Delta's
        ``readChangeFeed`` shape on the manifest log; no reference
        counterpart): offsets are manifest versions, and each micro-batch
        carries the per-version FILE DIFFS as rows — removed files emit
        their rows with ``_change_type='delete'`` before the version's
        added files emit theirs as ``'insert'``, each stamped with the
        ``_commit_version`` that caused the change. The streaming twin
        of :meth:`changes_between` (same file-granular contract: a
        rewritten file emits delete+insert pairs for its ride-along
        rows). Deletion-vector commits stream as KEY-ONLY delete rows
        (key columns filled, the rest NULL) — merge-on-read deletes
        reach subscribers too; a dv-bearing bootstrap snapshot ships
        dv-effective rows instead. A downstream sync can therefore
        subscribe instead of polling version pairs — the
        deletes-then-inserts replay order keeps it convergent.
        Exactly-once by construction: a replayed offset range re-derives
        the identical diff from the identical immutable manifests.
        ``partitioned=True`` fans the changed files out one-per-task
        (Arrow batches executor-side) for fat commits; the default
        (``None``) AUTO-selects by committed entry weight — see
        :meth:`_stream_px_auto`.

        ``starting_version`` picks where the feed begins (the Delta
        ``startingVersion`` shape): an int N streams changes from
        version N on (N's predecessor manifest must be retained — the
        vacuum-vs-checkpoint caveat); ``'earliest'`` starts at the
        oldest RETAINED version, replaying it as a full-snapshot
        bootstrap (all rows as inserts) when its predecessor was
        vacuumed — the state a new subscriber must absorb anyway;
        ``'latest'`` streams only versions committed after now."""
        if self.commit_mode != "manifest":
            raise TypeError("stream_changes() requires commit_mode='manifest'")
        if starting_version == "earliest":
            vs = self.versions()
            start = vs[0] if vs else 1
        elif starting_version == "latest":
            vs = self.versions()
            start = (vs[-1] if vs else 0) + 1
        elif isinstance(starting_version, int) and starting_version >= 1:
            start = starting_version
        else:
            raise ValueError(
                f"starting_version must be an int >= 1, 'earliest' or "
                f"'latest': {starting_version!r}"
            )
        meta = load_meta(self.main_path, spark=self._spark)
        schema = meta.schema if meta and meta.schema else self.get_full_df().schema
        if not schema.fields:
            raise TypeError("stream_changes() needs a committed schema (write once first)")
        out_schema = T.StructType(
            list(schema.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
            ]
        )
        from .manifest_stream import register_manifest_stream

        spark = self._session()
        register_manifest_stream(spark)
        r = spark.readStream.format(
            "pqrs_manifest_stream_px"
            if self._stream_px_auto(partitioned)
            else "pqrs_manifest_stream"
        )
        if hold:
            if "/" in hold or hold.startswith("."):
                raise ValueError(f"bad hold name {hold!r}")
            r = r.option("retention_hold", hold)
        df = (
            r.option("root", self.main_path)
            .option("cdf", "1")
            .option("cdf_start", str(start))
            .option(
                "schema_ddl",
                ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_schema.fields),
            )
            .option("schema_json", out_schema.json())
            .option("cols", ",".join(f.name for f in out_schema.fields))
            .option(
                "col_types", ",".join(f.dataType.simpleString() for f in out_schema.fields)
            )
            .load()
        )
        # governed CDF: masks + filter apply per emitted row, so a replica
        # synced from a governed handle holds only governed values; key-only
        # delete tombstones (filter undecidable) are forwarded — see
        # _apply_policy's tombstone contract
        return (
            self._apply_policy(df, tombstone_col="_change_type")
            if self.governed
            else df
        )

    def sync_from(
        self,
        source: "TableRepo",
        checkpoint: str,
        starting_version: int | str = 1,
        timeout_sec: float = 600,
        hold: str | None = None,
    ) -> None:
        """Incrementally replicate ``source`` into this table by draining
        its change-data-feed once (``availableNow``) — the CONSUMER side
        of :meth:`stream_changes` (SURVEY §2 S30), closing the sync loop
        the feed exists for. Each micro-batch COLLAPSES to the latest
        change per key (version order; within a version an insert
        outranks the old-image delete of the same file-granular upsert —
        the Delta APPLY CHANGES shape) and applies as ONE fenced
        read-modify-write commit: touched replica rows anti-join the
        delete keys, union the surviving inserts, publish under fence
        ``(source-root, max version)`` —

        - O(1) commits per refresh, however many source versions the
          batch spans (never O(versions) rewrites);
        - exactly-once, atomically: the fence is checked inside the
          publish CAS, so a crash replay (or a concurrent ``sync_from``
          on the same replica) no-ops BEFORE any write job; emptied
          partitions prune in the SAME commit; delete-only batches
          publish a fence-carrying empty entry;
        - re-batching with a fresh checkpoint stays convergent even
          though fences differ: collapsed upserts and keyed deletes
          re-apply to the same end state (transiently stale mid-replay,
          exact after the drain);
        - concurrent non-sync writes to the replica are caught by the
          normal RMW conflict gate (``ConcurrentWriteError``).

        Repeated calls are the incremental refresh: the stream checkpoint
        remembers the last consumed version, so each call pays only new
        commits. The replica must share the source's ``index_cols``
        (enforced — a mismatched key projection would silently
        over-delete). At 100 TB this is the cross-region/table
        replication shape: O(changed files) per refresh, never a
        full-table diff. ``hold`` names a retention hold the feed
        advances on the SOURCE per refresh, so a source-side vacuum can
        never prune below this replica's checkpoint horizon (see
        :meth:`register_retention_hold`; holds expire by age if the
        replica is abandoned)."""
        self._assert_ungoverned("sync_from")
        if self.commit_mode != "manifest":
            raise TypeError("sync_from() requires commit_mode='manifest' on the replica")
        if not self.index_cols:
            raise TypeError("sync_from() needs index_cols (keyed deletes)")
        if list(self.index_cols) != list(source.index_cols):
            raise TypeError(
                f"sync_from(): replica index_cols {self.index_cols} must equal "
                f"the source's {source.index_cols} — a mismatched key "
                "projection would silently over-delete"
            )
        src_id = source.main_path
        repl = self

        def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
            from pyspark.sql import Window

            rows = batch_df.persist()
            try:
                # collapse the batch to the LATEST change per key (the
                # Delta APPLY CHANGES shape): within a version, inserts
                # outrank deletes — a file-granular upsert emits the old
                # image as delete and the new one as insert in the same
                # version, and the insert is the surviving fact. One
                # fenced rewrite applies the whole batch, however many
                # source versions it spans — O(1) commits per refresh,
                # not O(versions), and naturally idempotent (upserts and
                # keyed deletes re-apply to the same end state even if a
                # fresh checkpoint re-batches with different fences).
                w = Window.partitionBy(*repl.index_cols).orderBy(
                    F.col("_commit_version").desc(),
                    (F.col("_change_type") == "insert").cast("int").desc(),
                )
                latest = (
                    rows.withColumn("__rn", F.row_number().over(w))
                    .where(F.col("__rn") == 1)
                    .drop("__rn")
                    .persist()
                )
                # kinds from the RAW batch, not the collapsed frame: a
                # delete collapsed away by a later same-key insert must
                # still force the upsert path — sync's fenced-append
                # shortcut is only sound when the source batch removed
                # NOTHING anywhere
                agg = rows.groupBy("_change_type").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.max("_commit_version").alias("hi"),
                ).collect()
                if not agg:
                    return
                kinds = {r["_change_type"]: r for r in agg}
                hi = max(int(r["hi"]) for r in agg)
                dels = (
                    latest.where(F.col("_change_type") == "delete").select(
                        *repl.index_cols
                    )
                    if "delete" in kinds
                    else None
                )
                ins = (
                    latest.where(F.col("_change_type") == "insert").drop(
                        "_change_type", "_commit_version"
                    )
                    if "insert" in kinds
                    else None
                )
                repl._apply_keyed_changes(dels, ins, fence=(src_id, hi))
                latest.unpersist()
            finally:
                rows.unpersist()

        q = (
            source.stream_changes(starting_version=starting_version, hold=hold)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(timeout_sec)
        if q.exception() is not None:
            raise q.exception()
        if not finished:
            # timing out is NOT success: the replica is part-synced and
            # the query would keep mutating it behind the caller's back
            q.stop()
            raise TimeoutError(
                f"sync_from: feed not drained within {timeout_sec}s "
                "(raise timeout_sec, or narrow starting_version)"
            )

    def _apply_keyed_changes(
        self, dels: DataFrame | None, ins: DataFrame | None, fence: tuple
    ) -> None:
        """Apply one CDF version — delete keys out, insert rows in — as a
        single fenced overwrite commit (the sync_from unit of work).
        Partition-pruned like replace_records: only partitions holding a
        deleted key or receiving an insert are read back and rewritten.
        The fence makes the whole version idempotent ATOMICALLY: a replay
        (or concurrent sync) finds it in the manifest and no-ops before
        any write job."""
        from .manifest import load_manifest

        fkey = list(map(str, fence))
        mf0 = load_manifest(self._fs(), self.main_path)
        if mf0 and any(c.get("fence") == fkey for c in mf0["commits"]):
            return  # version already fully applied
        if dels is None and ins is not None:
            # insert-only batch (a collapsed batch carries deletes
            # whenever ANY source file was removed, so none here means
            # pure appends at the source): a fenced append suffices —
            # O(batch), no table read-back. The common streaming-ingest
            # replication case never pays a rewrite.
            self.extend_fenced(ins, fence=fence)
            return
        rmw = self._rmw_baseline()
        old = self._snapshot_df(rmw)
        keys = self.index_cols
        if ins is not None:
            ins = self._prepare(ins)
        if not old.columns:
            # brand-new replica (no committed schema yet): deletes have
            # nothing to touch — the version reduces to a fenced append
            # (empty, keys-schema, when the version was delete-only; the
            # canonical schema widens on the first real insert)
            self._write(
                ins if ins is not None else dels.limit(0),
                mode="append",
                fence=fence,
            )
            return
        # rows are DISPLACED by a delete key OR by an insert of the same
        # key (upsert semantics): the batch collapse keeps only the
        # latest change per key, so a key re-inserted after a delete
        # carries no delete row — the insert itself must supersede
        # whatever the replica holds
        gone_keys = None
        if dels is not None:
            gone_keys = dels.select(*keys)
        if ins is not None:
            ik = ins.select(*keys)
            gone_keys = ik if gone_keys is None else gone_keys.unionByName(ik)
        gone_keys = gone_keys.distinct()
        if self.group_cols:
            touched = (
                old.join(gone_keys, keys, "left_semi").select(*self.group_cols)
            )
            if ins is not None:
                touched = touched.unionByName(ins.select(*self.group_cols))
            touched_vals = {tuple(r) for r in touched.distinct().collect()}
            if not touched_vals:
                # nothing to rewrite, but the fence must still land
                self._write(
                    old.limit(0) if ins is None else ins.limit(0),
                    mode="append",
                    fence=fence,
                )
                return
            out = old.where(self._group_filter(touched_vals)).join(
                gone_keys, keys, "left_anti"
            )
            if ins is not None:
                out = out.unionByName(ins)
            out = out.localCheckpoint(eager=True)
            kept_vals = {tuple(r) for r in out.select(*self.group_cols).distinct().collect()}
            self._write(
                out, mode="overwrite", dynamic=True, fence=fence, rmw_baseline=rmw,
                prune=touched_vals - kept_vals,
            )
        else:
            out = old.join(gone_keys, keys, "left_anti")
            if ins is not None:
                out = out.unionByName(ins)
            out = out.localCheckpoint(eager=True)
            self._write(
                out, mode="overwrite", dynamic=False, fence=fence, rmw_baseline=rmw
            )

    def as_view(self, name: str | None = None) -> str:
        """Register the table as a temp view (default name: the table's
        basename) and return the view name — the SQL front door
        (`spark.sql(f"SELECT ... FROM {t.as_view()}")`). The view is a
        plain read of the current root, so partition pruning / pushdown /
        snapshot semantics are identical to :meth:`get_full_df`; re-call
        after ``set_env`` to point the view at the new root."""
        view = name or self.name
        self.get_full_df().createOrReplaceTempView(view)
        return view

    def map_partitions_arrow(
        self,
        fun: Callable,
        schema: T.StructType | str,
        level: str | None = None,
    ) -> DataFrame:
        """Arrow-native per-partition apply (``applyInArrow``): ``fun``
        receives each group as a ``pyarrow.Table`` and returns one. Skips
        the pandas conversion ``map_partitions`` pays on both edges — for
        columnar work (filters, projections, arrow-compute kernels) the
        group payload stays zero-copy Arrow end to end, which at 100 TB
        is the difference between the python stage being bandwidth-bound
        and conversion-bound. Same grouping semantics as
        :meth:`map_partitions`."""
        if not self.group_cols:
            raise TypeError("not a grouped table")
        cols = [level] if level else list(self.group_cols)
        return self.get_full_df().groupBy(*cols).applyInArrow(fun, schema)

    # ---------------------------------------------------------------- private

    def _session(self) -> SparkSession:
        return self._spark or active_spark()

    def _prepare(self, df: DataFrame) -> DataFrame:
        """Generate, bucket-assign, null-group-filter, schema-align,
        constraint-check (write-side)."""
        df = self._apply_generated(df)
        if self.partitioner is not None and self.partitioner.bucket_col not in df.columns:
            df = self.partitioner.assign(df, index_cols=self.index_cols)
        for gc in self.group_cols:
            # pandas groupby drops null group keys silently (reference
            # core.py:350, SURVEY §7.3.3) — match it, instead of Spark's
            # __HIVE_DEFAULT_PARTITION__ dirs
            df = df.where(F.col(gc).isNotNull())
        df = self._align(df)
        return self._apply_constraints(df)

    def _apply_generated(self, df: DataFrame) -> DataFrame:
        """GENERATED-column write gate: absent columns are computed from
        their expression (pure Column ops — runs first so a generated
        PARTITION column exists before the null-group filter and bucket
        assignment), present columns are VALIDATED against it with one
        map-side-combined aggregate and any null-safe mismatch rejects
        the whole batch — the Delta GENERATED ALWAYS AS contract: the
        invariant readers rely on for partition pruning ("day really is
        date(ts)") can never be broken by a writer-supplied value."""
        if not self.generated_cols:
            return df
        checks = []
        for c, expr in self.generated_cols.items():
            if c not in df.columns:
                df = df.withColumn(c, F.expr(expr))
            else:
                checks.append(
                    F.sum(
                        (~F.col(c).eqNullSafe(F.expr(expr))).cast("long")
                    ).alias(c)
                )
        if checks:
            bad = df.agg(*checks).collect()[0].asDict()
            viol = {c: int(n) for c, n in bad.items() if n}
            if viol:
                raise ValueError(
                    f"write to {self.name!r} supplies generated column(s) "
                    f"with values diverging from their expression "
                    f"(rows per column: {viol}) — omit the column or fix "
                    "the producer; generated columns are ALWAYS derived"
                )
        return df

    def _apply_constraints(self, df: DataFrame) -> DataFrame:
        """CHECK-constraint gate (SQL semantics — NULL passes), one
        map-side-combined aggregate over the batch (never the table).
        mode 'fail': any FALSE row rejects the WHOLE batch before a file
        lands (the failure path pays one more small job for example
        rows). mode 'drop': rows violating ANY constraint are filtered
        from the write and per-constraint counts land in
        ``last_constraint_drops``. Callers writing expensive lineage
        should checkpoint/persist upstream — the check re-evaluates the
        batch plan, same as the stats pass."""
        if not self.constraints:
            return df
        viol = {
            name: F.sum(
                F.when(~F.coalesce(F.expr(expr), F.lit(True)), 1).otherwise(0)
            ).alias(name)
            for name, expr in self.constraints.items()
        }
        row = df.agg(*viol.values()).first()
        bad = {n: int(row[n]) for n in self.constraints if row[n]}
        if self.constraint_mode == "drop":
            self.last_constraint_drops = bad
            if not bad:
                return df
            keep = F.lit(True)
            for expr in self.constraints.values():
                keep = keep & F.coalesce(F.expr(expr), F.lit(True))
            return df.where(keep)
        if bad:
            name = next(iter(bad))
            examples = (
                df.where(~F.coalesce(F.expr(self.constraints[name]), F.lit(True)))
                .limit(3)
                .collect()
            )
            raise ValueError(
                f"CHECK constraint(s) violated for {self.name}: "
                + ", ".join(f"{n} ({c} rows)" for n, c in bad.items())
                + f"; e.g. {[tuple(r) for r in examples]} fail {self.constraints[name]!r}"
            )
        return df

    def _handle_config(self) -> dict:
        """This handle's table-level properties, persisted into the
        sidecar at table creation so :meth:`open` can reconstruct an
        identically-configured handle later. A HashPartitioner serializes
        as its (col, num_groups) spec."""
        cfg: dict = {
            "index_cols": list(self.index_cols),
            "commit_mode": self.commit_mode,
        }
        if self.partitioner is not None:
            cfg["hash_partitioner"] = {
                "col": self.partitioner.col,
                "num_groups": self.partitioner.num_groups,
            }
        else:
            cfg["group_cols"] = list(self.group_cols)
        for k in (
            "max_records",
            "cluster_by",
            "cluster_algo",
            "compression",
            "stats_cols",
            "bloom_cols",
            "constraints",
            "constraint_mode",
            "generated_cols",
            "manifest_inline_files_max",
        ):
            v = getattr(self, k)
            if v not in (None, [], {}, 0) and not (
                k == "cluster_algo" and v == "sort"
            ) and not (k == "constraint_mode" and v == "fail") and not (
                k == "manifest_inline_files_max" and v == 2000
            ):
                cfg[k] = v
        return cfg

    @classmethod
    def open(cls, root_path: str, spark: SparkSession | None = None, **overrides) -> "TableRepo":
        """Reopen an existing table from its persisted configuration —
        the catalog shape: partitioning, key columns, clustering,
        stats/bloom index columns, constraints, codec, and commit
        protocol all come from the sidecar the creating handle wrote,
        so every process operates the table identically without
        re-stating (and risking to mis-state) the properties.
        ``overrides`` replace individual persisted values."""
        meta = load_meta(str(root_path), spark=spark)
        if meta is None:
            raise FileNotFoundError(
                f"no table sidecar at {root_path!r} — open() needs a table "
                "created by a TableRepo write (or construct one explicitly)"
            )
        cfg = dict(meta.config or {})
        if not cfg:
            # pre-config sidecar: fall back to the layout facts it does
            # carry (partitioning + keys); the commit protocol is
            # probeable — a _pqrs_manifest dir means manifest mode, and
            # guessing 'files' there would read the table as EMPTY
            # (data lives under the underscore-hidden _pqrs_data)
            from .manifest import MANIFEST_DIR

            fs = fs_for(str(root_path), spark=spark)
            cfg = {
                "group_cols": meta.group_cols,
                "index_cols": meta.index_cols,
                "commit_mode": (
                    "manifest"
                    if fs.exists(join_path(str(root_path), MANIFEST_DIR))
                    else "files"
                ),
            }
        cfg.pop("policy", None)  # read-path contracts, not ctor args
        cfg.pop("role_policies", None)
        hp = cfg.pop("hash_partitioner", None)
        if hp is not None and "group_cols" not in overrides:
            cfg["group_cols"] = HashPartitioner(hp["col"], hp["num_groups"])
        cfg.update(overrides)
        return cls(str(root_path), spark=spark, **cfg)

    def _align(self, df: DataFrame) -> DataFrame:
        from ..plans.schema import as_nullable

        meta = load_meta(self.main_path, spark=self._spark)
        if meta is None or meta.schema is None:
            schema = as_nullable(self.fixed_schema or df.schema)
            meta = TableMeta(
                schema=schema,
                group_cols=self.group_cols,
                index_cols=self.index_cols,
                extra_metadata=self.extra_metadata,
                config=self._handle_config(),
            )
            save_meta(self.main_path, meta, spark=self._spark)
            return align_to_schema(df, schema)
        if self.commit_mode == "manifest":
            # the CAS-published log is the schema authority once DDL has
            # happened — a DDL that has published its epoch but not yet
            # refreshed the sidecar cache must not make this writer align
            # (and null out) against the stale cached shape
            df, log_schema = self._translate_stale_names(df)
            if log_schema is not None:
                meta.schema = log_schema
        if self.allow_schema_extension:
            widened, grew = widen_schema(meta.schema, df.schema)
            if grew:
                # sidecar-only widening: existing files are NOT rewritten
                # (the reference rewrites every old file, core.py:411-421 —
                # an O(table) job hidden inside an append; at 100 TB that is
                # a non-starter). The explicit-schema read in get_full_df
                # nulls the missing columns, so read-back output is
                # identical; callers wanting the reference's physical layout
                # run rewrite_to_canonical() as an explicit maintenance job.
                from ..plans.schema import as_nullable

                meta.schema = as_nullable(widened)
                save_meta(self.main_path, meta, spark=self._spark)
                self._sync_widening_to_log(meta.schema)
        return align_to_schema(df, meta.schema)

    _MUTABLE_PROPS = (
        "max_records",
        "cluster_by",
        "cluster_algo",
        "compression",
        "stats_cols",
        "bloom_cols",
        "constraints",
        "constraint_mode",
        "generated_cols",
        "manifest_inline_files_max",
    )

    def set_table_properties(self, **props) -> None:
        """ALTER-TABLE-SET-properties (catalog shape): update the
        sidecar-persisted table configuration AND this handle, so future
        :meth:`open` handles and this process agree. Mutable properties
        only — partitioning, key columns, and the commit protocol are
        structural (changing them is a rebuild/evolution operation, not
        a property flip) and are refused. List-valued properties accept
        a string for one element, like the constructor."""
        self._assert_ungoverned("set_table_properties")
        bad = [k for k in props if k not in self._MUTABLE_PROPS]
        if bad:
            raise ValueError(
                f"set_table_properties: {bad} not settable (mutable: "
                f"{list(self._MUTABLE_PROPS)})"
            )
        if "cluster_algo" in props and props["cluster_algo"] not in ("sort", "zorder"):
            raise ValueError("cluster_algo must be 'sort' or 'zorder'")
        if props.get("stats_cols") and self.commit_mode != "manifest":
            raise ValueError("stats_cols requires commit_mode='manifest'")
        meta = load_meta(self.main_path, spark=self._spark)
        if meta is None:
            raise RuntimeError("set_table_properties() needs a written table")
        for k, v in props.items():
            if k in ("cluster_by", "stats_cols", "bloom_cols") and isinstance(v, str):
                v = [v]
            setattr(self, k, v if v is not None else ([] if k in (
                "cluster_by", "stats_cols", "bloom_cols") else v))
        # replace the mutable slice wholesale: _handle_config OMITS
        # default-valued keys, so a property reset to its default must
        # DROP the old persisted value, not merge over it
        new_cfg = self._handle_config()
        cfg = dict(meta.config or {})
        for k in self._MUTABLE_PROPS:
            cfg.pop(k, None)
            if k in new_cfg:
                cfg[k] = new_cfg[k]
        meta.config = cfg
        save_meta(self.main_path, meta, spark=self._spark)

    # ------------------------------------------------- governance policies

    def set_policy(
        self,
        row_filter: str | None = None,
        column_masks: dict[str, str] | None = None,
        role: str | None = None,
    ) -> None:
        """Persist a table-level GOVERNANCE policy (the catalog
        row-filter / column-mask shape): ``row_filter`` is a SQL
        predicate rows must satisfy to surface, ``column_masks`` maps
        column → masking SQL expression (evaluated over the row, cast
        back to the column's type — masking never changes the schema).
        Stored in the sidecar beside the table config, so every handle
        — including :meth:`open` — sees the same policy;
        :meth:`get_full_df_governed` applies it. Validated against the
        canonical schema here, not at read time. Pass both as None to
        clear. Policies are read-path contracts for consumers; they do
        not rewrite data (scrub at rest with update_where/pii tooling
        when erasure, not governance, is the requirement).

        ``role`` binds the policy to a PRINCIPAL (the catalog
        grant shape — round-7 verdict #8): handles opened with
        ``open(root, governed_as=role)`` resolve that role's policy;
        roleless ``set_policy`` keeps setting the table DEFAULT every
        plain governed handle (and any role without its own grant when a
        default exists) resolves. Clearing a role (both args None with
        ``role=``) removes only that grant."""
        self._assert_ungoverned("set_policy")
        meta = load_meta(self.main_path, spark=self._spark)
        if meta is None or meta.schema is None:
            raise RuntimeError("set_policy() needs a written table (canonical schema)")
        from ..plans.schema import resolve_path_type

        known = {f.name for f in meta.schema.fields}
        for c in column_masks or {}:
            if "." in c:
                # NESTED mask (round-8): a dotted path resolved exactly
                # like nested DDL — through struct members and
                # array/map-value containers at any depth
                if resolve_path_type(meta.schema, c) is None:
                    raise KeyError(f"set_policy: no nested field {c!r} to mask")
            elif c not in known:
                raise KeyError(f"set_policy: no column {c!r} to mask")
        # analyze every expression against the canonical schema NOW — an
        # invalid filter/mask must fail at set time, not at the first
        # governed read (where the reader can neither fix nor bypass it)
        probe = self._session().createDataFrame([], meta.schema)
        if row_filter:
            try:
                probe.where(F.expr(row_filter)).schema
            except Exception as e:
                raise ValueError(
                    f"set_policy: row_filter {row_filter!r} does not analyze "
                    f"against the table schema: {e}"
                ) from e
        ptypes = dict(probe.dtypes)
        for c, m in (column_masks or {}).items():
            tgt = (
                resolve_path_type(meta.schema, c).simpleString()
                if "." in c
                else ptypes[c]
            )
            try:
                probe.select(F.expr(m).cast(tgt).alias("__m")).schema
            except Exception as e:
                raise ValueError(
                    f"set_policy: mask for {c!r} ({m!r}) does not analyze "
                    f"against the table schema: {e}"
                ) from e
        pol = {}
        if row_filter:
            pol["row_filter"] = row_filter
        if column_masks:
            pol["column_masks"] = dict(column_masks)
        cfg = dict(meta.config or {})
        if role is None:
            if pol:
                cfg["policy"] = pol
            else:
                cfg.pop("policy", None)
        else:
            rp = dict(cfg.get("role_policies") or {})
            if pol:
                rp[role] = pol
            else:
                rp.pop(role, None)
            if rp:
                cfg["role_policies"] = rp
            else:
                cfg.pop("role_policies", None)
        meta.config = cfg
        save_meta(self.main_path, meta, spark=self._spark)

    def _policy(self) -> dict:
        """The governance policy THIS handle resolves (empty dict when
        none). Role-bound handles (``governed_as``) get their role's
        grant, else the table default, and fail CLOSED — PermissionError
        — when the table carries role grants but none for this role and
        no default (a typo'd principal must never read raw). One
        KB-sized sidecar read per call — deliberate: the policy must be
        re-read so a set_policy() from another handle takes effect
        without reopening this one (the same freshness contract every
        read already pays via load_meta); multi-step paths thread the
        loaded ``pol`` into :meth:`_apply_policy` instead of re-calling."""
        meta = load_meta(self.main_path, spark=self._spark)
        cfg = (meta and meta.config) or {}
        if self.governed_as is not None:
            rp = cfg.get("role_policies") or {}
            if self.governed_as in rp:
                return rp[self.governed_as]
            default = cfg.get("policy")
            if default:
                return default
            if rp:
                raise PermissionError(
                    f"role {self.governed_as!r} has no policy grant on "
                    f"{self.name!r} (and the table has no default policy) — "
                    "fail-closed; grant it via set_policy(role=...)"
                )
            return {}
        default = cfg.get("policy")
        if default:
            return default
        if cfg.get("role_policies"):
            # a table governed ONLY by role grants: a roleless governed
            # handle must not resolve an empty policy and read raw —
            # omitting the role cannot grant more than naming a wrong one
            raise PermissionError(
                f"{self.name!r} is governed by per-role grants and has no "
                "default policy — open it with governed_as=<role> (or have "
                "the owner set a default via set_policy())"
            )
        return {}

    def _apply_policy(
        self, df: DataFrame, pol: dict | None = None, tombstone_col: str | None = None
    ) -> DataFrame:
        """Fold the governance policy into a frame: masked columns are
        replaced by their masking expression (cast to the original type)
        FIRST, then the row filter — a filter sees MASKED values, so a
        consumer-visible predicate can never leak raw ones;
        NULL-evaluating filters drop the row (fail-closed). Pure Column
        ops — Catalyst folds masks into the scan projection (a constant
        mask even prunes the raw column from the read schema), and the
        same expressions work unchanged on STREAMING frames.

        ``tombstone_col`` names a change-type column on CDF frames:
        ``'delete'`` rows whose filter outcome is UNDECIDABLE (NULL —
        key-only tombstones carry no data columns) are forwarded rather
        than fail-closed, because suppressing them would leave a
        governed replica retaining rows the source deleted; key
        presence is the only disclosure, and the keys of rows the
        consumer could once see are already known to it."""
        pol = self._policy() if pol is None else pol
        masks = pol.get("column_masks") or {}
        if masks:
            from ..plans.schema import mask_path_expr

            types = dict(df.dtypes)
            flat = {c: m for c, m in masks.items() if "." not in c}
            nested: dict[str, list[tuple[list[str], str]]] = {}
            for c, m in masks.items():
                if "." in c:
                    top, *rest = c.split(".")
                    nested.setdefault(top, []).append((rest, m))
            cols = []
            for c in df.columns:
                if c in flat:
                    cols.append(F.expr(flat[c]).cast(types[c]).alias(c))
                elif c in nested:
                    # nested masks rewrite the member IN PLACE via
                    # withField / transform chains (one codegen
                    # projection; NULL structs stay NULL) — the mask
                    # expression is row-context, like top-level masks
                    dt = df.schema[c].dataType
                    expr = F.col(c)
                    for rest, m in nested[c]:
                        expr = mask_path_expr(expr, dt, rest, F.expr(m))
                    cols.append(expr.alias(c))
                else:
                    cols.append(F.col(c))
            df = df.select(*cols)
        rf = pol.get("row_filter")
        if rf:
            fallback = (
                F.col(tombstone_col) == F.lit("delete")
                if tombstone_col and tombstone_col in df.columns
                else F.lit(False)
            )
            df = df.where(F.coalesce(F.expr(rf), fallback))
        return df

    def _assert_ungoverned(self, op: str) -> None:
        if self.governed:
            raise PermissionError(
                f"{op}: refused on a governed handle of {self.name!r} — "
                "governance policies are read-path contracts for consumers; "
                "mutations need the owner's ungoverned handle "
                "(TableRepo.open(root) or this_handle.ungoverned())"
            )

    def _refuse_leaky_metadata(self, op: str) -> None:
        """Physical-layout metadata surfaces (per-file column stats,
        partition directories, per-partition row counts) can disclose
        raw values or the existence of rows a policy hides — on a
        governed handle with an active policy they are refused rather
        than served filtered (a half-true stats surface would silently
        mislead maintenance tooling)."""
        if self.governed and self._policy():
            raise PermissionError(
                f"{op}: refused on a governed handle of {self.name!r} with an "
                "active policy — physical metadata can leak raw values/rows "
                "the policy hides; use the owner's ungoverned handle"
            )

    def ungoverned(self) -> "TableRepo":
        """The owner's escape hatch: a twin handle with governance OFF
        (reads raw, writes allowed). Deliberately trivial — governance
        here is perimeter discipline like file permissions, not
        cryptography: whoever can construct a TableRepo on the root can
        read the files; the guarantee is that a handle HANDED to a
        consumer as governed cannot *accidentally* surface raw values
        through any read surface."""
        import copy

        twin = copy.copy(self)
        twin.governed = False
        twin.governed_as = None
        return twin

    def get_full_df_governed(self, version: int | None = None) -> DataFrame:
        """Full scan with the persisted policy applied regardless of the
        handle's ``governed`` flag (the explicit opt-in predating
        handle-wide governance; a governed handle's :meth:`get_full_df`
        already returns exactly this). No policy → identical to
        get_full_df."""
        # current-shape read even when versioned: the policy's masks name
        # CURRENT columns, and a snapshot-schema frame surfacing a
        # pre-rename column name would silently skip its mask (raw leak)
        df = self.get_full_df(version=version, bind_snapshot_schema=False)
        if self.governed:
            return df  # policy already folded in — never applied twice
        return self._apply_policy(df)

    def _translate_stale_names(self, df: DataFrame):
        """A frame built before a concurrent rename_column carries the
        OLD column name; name-based alignment would silently drop it and
        null the renamed field — a lost update with no error. Map stale
        names to their current ones by field id (oldest epoch first, so
        chains resolve to the newest mapping), only where the current
        name is absent from the frame — frames already speaking the
        current schema pass through untouched, and tables with no DDL
        history pay one exists() probe. Returns ``(df, current epoch
        schema or None)`` so the caller aligns against the log's truth,
        not a possibly-stale sidecar cache."""
        from ..plans.schema import as_nullable
        from .schema_log import load_schema_log, schema_of_fields

        slog = load_schema_log(self._fs(), self.main_path)
        if not slog:
            return df, None
        cur = slog[-1]
        cur_schema = as_nullable(schema_of_fields(cur["fields"]))
        if len(slog) < 2:
            return df, cur_schema
        renames: dict[str, str] = {}
        for e in slog[:-1]:
            by_id = {f["id"]: f["name"] for f in e["fields"]}
            for f in cur["fields"]:
                old = by_id.get(f["id"])
                if old is not None and old != f["name"]:
                    renames[old] = f["name"]
        for old, new in renames.items():
            if old in df.columns and new not in df.columns:
                df = df.withColumnRenamed(old, new)
        return df, cur_schema

    def _sync_widening_to_log(self, widened: T.StructType) -> None:
        """allow_schema_extension widening on a table that has a schema
        log must publish the new columns as a log epoch too (fresh field
        ids) — otherwise the widened write's column set would match no
        epoch and the commit stamp would fail loudly."""
        from .schema_log import load_schema_log, next_field_id, publish_schema_version

        fs = self._fs()
        while True:
            log = load_schema_log(fs, self.main_path)
            if not log:
                return
            cur = log[-1]
            known = {f["name"] for f in cur["fields"]}
            add = [f for f in widened.fields if f.name not in known]
            if not add:
                return
            nid = next_field_id(log)
            fields = cur["fields"] + [
                {"id": nid + i, "name": f.name, "type": f.dataType.jsonValue()}
                for i, f in enumerate(add)
            ]
            if publish_schema_version(fs, self.main_path, fields, cur["v"] + 1):
                return

    def compact(self, partition_values: list | None = None, partition_col: str | None = None) -> None:
        """Small-file compaction — the maintenance job a 100 TB table under
        streaming/batch append pressure needs (every micro-batch append can
        leave one file per shuffle partition; readers then pay per-file
        open/footer costs). Rewrites the selected partitions (default: all)
        with rows re-clustered so each partition group lands in one task —
        one output file per group, split only by ``max_records``.

        Only the selected partitions are replaced (dynamic partition
        overwrite); other partitions' files are untouched. Like
        :meth:`rewrite_to_canonical`, must not run concurrently with
        writers to the same partitions."""
        self._assert_ungoverned("compact")
        if not self._live_paths():
            return
        self._refuse_pending_txns("compact")
        if partition_values is not None:
            pc = partition_col or (self.group_cols[0] if self.group_cols else None)
            if pc is None:
                raise TypeError("not a grouped table")
            df = self.get_full_df().where(F.col(pc).isin(list(partition_values)))
        else:
            df = self.get_full_df()
        if self.group_cols:
            df = df.repartition(*[F.col(c) for c in self.group_cols])
        else:
            # 8:1 target from the file listing (already in hand) — touching
            # df.rdd here would spin up RDD conversion machinery just to
            # count scan splits
            df = df.coalesce(max(1, self.n_files // 8))
        df = df.localCheckpoint(eager=True)
        # full-table compaction commits STATIC (partition-selective stays
        # dynamic): the read above already materialized the whole visible
        # table, and the static path additionally clears partitions whose
        # rows were all deletion-vector'd away and drops the dv entries
        # themselves (a dynamic prune would carry spent tombstones in the
        # manifest forever). Fence tombstones survive either path.
        dynamic = bool(self.group_cols) and partition_values is not None
        self._write(df, mode="overwrite", dynamic=dynamic)

    def maintain(self, max_files_per_partition: int = 8) -> list:
        """One-call maintenance sweep: compact exactly the partitions
        whose file count exceeds the threshold (decided from
        :meth:`stats` — the distributed ``_metadata`` rollup, no driver
        footer walking) and leave healthy partitions untouched. The
        nightly job a 100 TB table under streaming append pressure runs:
        cost is O(unhealthy partitions), not O(table). Returns the
        partition values compacted. Ungrouped tables compact whole when
        over the threshold. Like compact, not safe concurrent with
        writers to the same partitions."""
        self._assert_ungoverned("maintain")
        if not self.group_cols:
            if self.n_files > max_files_per_partition:
                self.compact()
                return ["<all>"]
            return []
        pc = self.group_cols[0]
        bad = [
            r[pc]
            for r in self.stats()
            .where(F.col("n_files") > max_files_per_partition)
            .select(pc)
            .distinct()
            .collect()
        ]
        if bad:
            self.compact(partition_values=bad, partition_col=pc)
        return bad

    def rewrite_to_canonical(self) -> None:
        """Explicit maintenance rewrite: materialize every file at the
        current canonical schema (the reference's widening rewrite,
        core.py:411-421, surfaced as an explicit O(table) job instead of an
        implicit append side effect — SURVEY §7.3.7). Also serves as a
        small-file compaction pass. Not safe to run concurrently with other
        writers (it is a full static overwrite)."""
        if not self._live_paths():
            return
        self._refuse_pending_txns("rewrite_to_canonical")
        old = self.get_full_df().localCheckpoint(eager=True)
        self._write(old, mode="overwrite", dynamic=False)

    def _refuse_pending_txns(self, op: str) -> None:
        """Maintenance rewrites (compact / rewrite_to_canonical) replace
        the table from its VISIBLE rows — publishing one would silently
        drop any entry gated on a still-undecided multi-table txn. Unlike
        ``replace_all`` (user-declared truncation, last-writer-wins by
        contract), maintenance has no mandate to destroy in-flight
        transactions: refuse loudly, run again after the txn decides
        (and after :meth:`sweep_aborted_txns` for aborts)."""
        if self.commit_mode != "manifest":
            return
        from .manifest import load_manifest, txn_state

        mf = load_manifest(self._fs(), self.main_path)
        for c in (mf or {}).get("commits", []):
            if "txn" in c and txn_state(c["txn"]) == "pending":
                raise ConcurrentWriteError(
                    f"{op}: entry {c['dir']!r} belongs to undecided "
                    f"transaction {c['txn']!r} — a maintenance rewrite would "
                    "destroy it; decide the txn first"
                )

    def _dedup_keep_first(self, df: DataFrame, keys: list[str] | None = None) -> DataFrame:
        """Keep the first row per key in incoming order (reference
        core.py:119): row_number over a monotonic ingest sequence."""
        from pyspark.sql import Window

        keys = keys or self.index_cols
        w = Window.partitionBy(*keys).orderBy(F.col(_SEQ_COL))
        return (
            df.withColumn(_SEQ_COL, F.monotonically_increasing_id())
            .withColumn("__pqr_rn", F.row_number().over(w))
            .where(F.col("__pqr_rn") == 1)
            .drop(_SEQ_COL, "__pqr_rn")
        )

    def _group_filter(self, group_value_tuples: set[tuple]):
        """OR-of-ANDs literal predicate over the partition columns — the
        shape Catalyst turns into scan PartitionFilters."""
        if not group_value_tuples:
            return F.lit(False)
        if len(self.group_cols) == 1:
            return F.col(self.group_cols[0]).isin([gv[0] for gv in group_value_tuples])
        from functools import reduce

        conds = [
            reduce(lambda a, b: a & b, [F.col(c) == v for c, v in zip(self.group_cols, gv)])
            for gv in group_value_tuples
        ]
        return reduce(lambda a, b: a | b, conds)

    def _two_phase_append(self, df: DataFrame) -> None:
        """Commit an append via hidden staging + per-file rename (see
        ``_write``). File names are globally unique (each carries the
        write job's UUID), so renames from concurrent appends never
        collide; renames are same-filesystem and atomic on local/HDFS.

        Object-store caveat: on S3-class stores rename is copy+delete and
        NOT atomic, so this protocol degrades there — a reader can observe
        a half-copied file and the commit pays a full extra data copy. On
        such stores either declare ``single_writer=True`` (plain committer,
        no renames) or front the table with a manifest-committing layer;
        the long-term answer for concurrent object-store appends is a
        manifest commit (single CAS of a file list), not renames."""
        import uuid

        staging = join_path(self.main_path, f".pqrs_staging_{uuid.uuid4().hex[:12]}")
        w = df.write.mode("overwrite")
        if self.group_cols:
            w = w.partitionBy(*self.group_cols)
        if self.max_records:
            w = w.option("maxRecordsPerFile", self.max_records)
        if self.compression:
            w = w.option("compression", self.compression)
        w.parquet(staging)
        fs = self._fs()
        marker = _fsmod.basename(staging)
        staged = fs.list_files(staging, ".parquet")
        # rel is anchored on the unique staging component of the LISTED
        # path, not on the written root string: Hadoop normalizes URIs
        # (file:///x → file:/x, authority stripped for local FS), so
        # counting components of the written form can misalign and drop
        # the partition dirs from the destination
        moves = []
        for p in staged:
            parts = path_parts(p)
            rel = parts[parts.index(marker) + 1:]
            moves.append((p, join_path(self.main_path, *rel)))
        # one mkdirs per distinct partition dir, renames fanned out over
        # driver threads — 2×N sequential FS round-trips would dominate
        # commit latency for many-file appends
        for d in sorted({_fsmod.parent_dir(dest) for _, dest in moves}):
            fs.mkdirs(d)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(moves)) or 1) as ex:
            list(ex.map(lambda m: fs.rename(m[0], m[1]), moves))
        # delete staging ONLY after every rename succeeded: on a partial
        # failure the staging dir (with the unrenamed files) survives for
        # recovery instead of being destroyed by an unconditional cleanup
        fs.delete(staging)

    def _write_manifest(
        self,
        df: DataFrame,
        mode: str,
        dynamic: bool,
        fence: tuple | None = None,
        meta=None,
        rmw_baseline: dict | None = None,
        prune: set | None = None,
    ) -> None:
        """Manifest-mode commit (sources/manifest.py): write the batch ONCE
        into a fresh ``_pqrs_data/<uuid>`` dir (hive-partitioned inside, so
        partition pruning still works), then CAS-publish the next manifest
        version. No renames ever — the write is final where it lands, and
        visibility is the manifest flip. Losing the CAS costs re-reading
        one small JSON and re-deriving the file list, never re-writing
        data; concurrent appends and disjoint partition overwrites
        therefore compose, and a conflicting SAME-partition overwrite is
        last-committer-wins (same as dynamic overwrite on files)."""
        from .manifest import load_manifest

        fs = self._fs()
        fkey = list(map(str, fence)) if fence is not None else None
        if fkey is not None:
            # replayed micro-batch: its fence already committed → no-op
            # BEFORE paying the write job (the exactly-once fast path)
            cur0 = load_manifest(fs, self.main_path)
            if cur0 and any(c.get("fence") == fkey for c in cur0["commits"]):
                return
        entry = self._stage_entry(df, meta=meta)
        if fkey is not None:
            entry["fence"] = fkey
        if prune:
            # partitions this commit DECLARES empty (a keyed rewrite that
            # removed every row of them) — pruned in the SAME CAS as the
            # new files + fence, so a fenced version-apply is atomic: no
            # crash window between "rows written" and "emptied dirs
            # dropped" (the separate _drop_emptied_partitions commit
            # would be skipped forever once the fence exists)
            from .manifest import hive_value

            entry["prune"] = sorted(
                [hive_value(v) for v in gv] for gv in prune
            )
        self._publish_entry(entry, mode, dynamic, fkey, rmw_baseline=rmw_baseline)

    def _stage_entry(self, df: DataFrame, meta=None) -> dict:
        """First half of a manifest commit: write the batch once into a
        fresh ``_pqrs_data/<uuid>`` dir and build its manifest entry
        (files, spec, stats, blooms) — WITHOUT publishing. Shared by the
        direct commit path (_write_manifest) and write-audit-publish
        (stage_extend), whose whole point is the gap between this and
        _publish_entry."""
        import uuid

        from .manifest import DATA_DIR

        fs = self._fs()
        rel_dir = f"{DATA_DIR}/{uuid.uuid4().hex[:16]}"
        cdir = join_path(self.main_path, rel_dir)
        w = df.write.mode("overwrite")
        if self.group_cols:
            w = w.partitionBy(*self.group_cols)
        if self.max_records:
            w = w.option("maxRecordsPerFile", self.max_records)
        if self.compression:
            w = w.option("compression", self.compression)
        w.parquet(cdir)
        files = self._list_commit_rel_files(fs, cdir, rel_dir)
        entry = {"dir": rel_dir, "files": files, "spec": list(self.group_cols)}
        from .schema_log import load_schema_log

        slog = load_schema_log(fs, self.main_path)
        if slog:
            # stamp the epoch this batch was actually WRITTEN under by
            # matching its (aligned) column set — not "the latest epoch",
            # so a write racing a concurrent rename lands with the epoch
            # whose names it really used and readers map it by field id
            names = set(df.columns)
            # names AND types: alter_column_type epochs share a name set,
            # and a batch aligned under the pre-widen epoch that commits
            # after the widen must stamp the epoch whose TYPES it wrote —
            # stamping the widened one would make readers open its int32
            # files with a bigint schema, no cast, and fail forever
            import json as _json

            # canonical-JSON the types: struct columns' jsonValue() is a
            # dict (unhashable, and key order is not guaranteed)
            def _tkey(t):
                return _json.dumps(t, sort_keys=True)

            typed = {
                (f.name, _tkey(f.dataType.jsonValue())) for f in df.schema.fields
            }
            hit = None
            for e in reversed(slog):
                if {(f["name"], _tkey(f["type"])) for f in e["fields"]} == typed:
                    hit = e["v"]
                    break
            if hit is None:
                for e in reversed(slog):
                    if {f["name"] for f in e["fields"]} == names:
                        hit = e["v"]
                        break
            if hit is not None:
                entry["schema_v"] = hit
            else:
                raise RuntimeError(
                    f"write to {self.name!r} carries columns {sorted(names)} "
                    "matching no schema epoch — align to the canonical "
                    "schema (or run the DDL) before writing"
                )
        if self.stats_cols and files:
            entry["stats"], nr = self._collect_file_stats(cdir, files, meta=meta)
            if len(nr) == len(files):
                # per-file rowcounts ride along free in the same stats agg
                # — the metadata-only count_rows() fast path reads them
                entry["rows"] = nr
        if self.bloom_cols and files:
            entry["blooms"], entry["bloom_types"] = self._collect_file_blooms(
                cdir, files, meta=meta
            )
        self._maybe_spill_files(entry)
        return entry

    def _list_commit_rel_files(self, fs, cdir: str, rel_dir: str) -> list[str]:
        """Relative paths of a freshly-written commit dir's parquet files.
        Splits each listed URI on the unique uuid commit-dir segment,
        never a component count: HadoopFS lists FULLY-QUALIFIED URIs
        (authority included), so an authority-less root ('hdfs:///w/t')
        would shift a count-based slice and corrupt every rel path in
        the manifest (the normalization hazard _two_phase_append
        documents). A URI not containing the marker fails loudly —
        silently slicing at rfind's -1 would record a corrupt rel
        path."""
        marker = rel_dir.split("/")[-1] + "/"
        files = []
        for p in fs.list_files(cdir, ".parquet"):
            norm = "/".join(path_parts(p))
            pos = norm.rfind("/" + marker)
            if pos < 0:
                raise AssertionError(
                    f"listed file {p!r} is not under commit dir marker {marker!r}"
                )
            files.append(norm[pos + len(marker) + 1:])
        return files

    def _maybe_spill_files(self, entry: dict) -> None:
        """Spill an oversized file list to an immutable side object so the
        version JSON stays pointer-sized (see manifest_inline_files_max)."""
        from .manifest import spill_entry_payload

        if len(entry["files"]) > self.manifest_inline_files_max:
            entry["files_ref"] = spill_entry_payload(
                self._fs(), self.main_path, entry
            )

    def _publish_entry(
        self,
        entry: dict,
        mode: str,
        dynamic: bool,
        fkey: list[str] | None = None,
        op: str | None = None,
        rmw_baseline: dict | None = None,
    ) -> None:
        """Second half of a manifest commit: CAS-publish a staged entry as
        the next manifest version, retrying against concurrent committers.
        Losing the CAS costs re-reading one small JSON and re-deriving the
        file list, never re-writing data."""
        from .manifest import (
            fold_decided_overwrites,
            load_manifest,
            partition_values_of,
            prune_partitions,
            try_commit,
        )

        fs = self._fs()
        files = entry["files"]
        touched = (
            {partition_values_of(f, self.group_cols) for f in files}
            | {tuple(t) for t in entry.get("prune", [])}
            if (dynamic and self.group_cols)
            else set()
        )
        while True:
            cur = load_manifest(fs, self.main_path)
            commits = list(cur["commits"]) if cur else []
            if fkey is not None and any(c.get("fence") == fkey for c in commits):
                return  # lost a race to our own replay — already in
            # settle committed txn-overwrites physically (read-identical:
            # effective_commits already showed this view) so the chain
            # stops carrying dead file refs forward
            commits = fold_decided_overwrites(commits)
            if rmw_baseline is not None:
                self._check_rmw_conflict(rmw_baseline, commits, dynamic, touched)
            if "ow" in entry:
                ow = entry["ow"]
                if ow.get("scope") == "groups":
                    # a deferred dynamic overwrite is only sound against
                    # commits written under ITS spec — same rule as the
                    # eager path, checked inside the CAS loop against the
                    # list the publish will actually land on
                    self._assert_uniform_spec(
                        [c for c in commits if c.get("kind") != "dv"]
                    )
                # a transactional overwrite must not silently mask an
                # entry gated on a DIFFERENT undecided transaction: that
                # txn's later commit would then apply only its OTHER
                # tables' writes — a torn multi-table txn with no error
                # (the same invariant _check_rmw_conflict enforces for
                # non-transactional keyed rewrites). Conflict loudly; the
                # caller decides the other txn (or retries after it).
                from .manifest import txn_state as _txn_state

                touched_ow = (
                    {tuple(t) for t in ow.get("touched", [])}
                    if ow.get("scope") == "groups"
                    else None
                )
                for c in commits:
                    m = c.get("txn")
                    if not m or m == entry.get("txn") or _txn_state(m) != "pending":
                        continue
                    if touched_ow is None:
                        clash = bool(c["files"])
                    else:
                        clash = any(
                            partition_values_of(f, list(ow.get("spec") or []))
                            in touched_ow
                            for f in c["files"]
                        )
                    if clash:
                        raise ConcurrentWriteError(
                            f"transactional overwrite of {self.name!r} would "
                            f"mask entry {c['dir']!r} gated on undecided "
                            f"transaction {m!r}; decide that transaction "
                            "first and rerun"
                        )
            if mode == "append":
                # a fenced entry publishes even with ZERO files: the fence
                # is the exactly-once marker, and consumers (sync_from)
                # rely on it to know a version's effects — which may be
                # deletes only — are fully applied; an unfenced empty
                # entry stays dropped. A txn-overwrite entry ("ow")
                # publishes even empty: replace_all of an empty frame is
                # a transactional truncation
                commits = commits + (
                    [entry] if (files or entry.get("fence") or entry.get("ow")) else []
                )
            elif dynamic and self.group_cols:
                self._assert_uniform_spec(commits)
                # fenced empty entries publish here too (same rule as the
                # append branch): a CDF-applied version that only DELETED
                # rows still needs its exactly-once marker
                commits = prune_partitions(commits, self.group_cols, touched) + (
                    [entry] if (files or entry.get("fence")) else []
                )
            else:  # static truncate-and-load
                # fence tombstones outlive even a full truncation: a
                # crashed exactly-once stream replaying an old epoch must
                # still see its fence, or it would re-append rows into the
                # deliberately reloaded table (same invariant
                # prune_partitions keeps on the dynamic path)
                tombs = [
                    # files emptied → drop the spilled-payload ref (it
                    # would serialize the old list back) AND the per-file
                    # maps (a truncated fenced commit otherwise carries
                    # its dead stats/rows/blooms in every later version)
                    {
                        k: v
                        for k, v in c.items()
                        if k not in ("files_ref", "stats", "rows", "blooms", "bloom_types")
                    }
                    | {"files": []}
                    for c in commits
                    if "fence" in c
                ]
                commits = tombs + (
                    [entry] if (files or entry.get("fence")) else []
                )
            if mode == "append" and cur and cur.get("spec") is not None:
                # an append must not revert a concurrent evolution: the
                # manifest's spec is authoritative; this writer's entry
                # records its own layout in entry["spec"] (mixed specs
                # are a supported read state)
                nxt_spec = cur["spec"]
            else:
                nxt_spec = list(self.group_cols)
            nxt = {
                "version": (cur["version"] if cur else 0) + 1,
                "commits": commits,
                "spec": nxt_spec,
                "op": op
                or (
                    "append"
                    if mode == "append"
                    else ("overwrite-dynamic" if (dynamic and self.group_cols) else "overwrite")
                ),
            }
            if try_commit(fs, self.main_path, nxt, prev_ts=(cur or {}).get("ts", 0.0)):
                return

    def _check_rmw_conflict(
        self, baseline: dict, commits: list[dict], dynamic: bool, touched: set
    ) -> None:
        """Optimistic-concurrency gate for read-MODIFY-write publishes
        (keyed upsert / merge / keyed+predicate delete): the rewrite was
        computed from the baseline snapshot, so a commit that landed
        since and whose rows the rewrite would silently erase or
        resurrect is a CONFLICT, raised loudly for the caller to rerun —
        never last-writer-wins data loss (the Delta/Iceberg
        ConcurrentAppend/ConcurrentDelete contract). Conflicting:

        - any new deletion-vector commit (the rewrite re-publishes rows
          read before the tombstone — landing after it would resurrect
          them);
        - dynamic overwrite: a new commit with files in the partitions
          this rewrite replaces (its rows would be pruned away);
        - static truncate-and-load: ANY new commit (truncation erases
          everything the baseline read missed).

        Plain appends/overwrites never pass a baseline: replace_groups /
        replace_all are DECLARED whole-partition/table replacement, where
        last-writer-wins is the semantics, not a hazard.

        Detection is symmetric — ADDED rows and REMOVED rows both
        conflict. A concurrent delete/merge that only removes files
        publishes a prune-only commit (dirs unchanged, files shrunk, or
        the dir vanishes entirely); this rewrite's output was computed
        from the pre-delete snapshot, so publishing it would RESURRECT
        the deleted rows. The baseline therefore carries per-dir file
        sets and any baseline file now missing (in a touched partition,
        for dynamic rewrites; anywhere, for static) is a conflict too."""
        from .manifest import partition_values_of

        from .manifest import txn_state

        cur_files = {c["dir"]: c["files"] for c in commits}
        new_cs = [c for c in commits if c["dir"] not in baseline["dirs"]]
        for c in new_cs:
            if "txn" in c and txn_state(c["txn"]) == "aborted":
                # a dead entry: its rows will never become visible, so the
                # rewrite neither erases nor resurrects anything by
                # ignoring it (the sweep that physically drops it is a
                # no-data change). Pending entries deliberately fall
                # through — pruning a partition that holds an undecided
                # txn's files would destroy data the txn may yet commit.
                continue
            if c.get("kind") == "dv":
                raise ConcurrentWriteError(
                    f"concurrent deletion-vector commit {c['dir']!r} landed "
                    f"since this rewrite's snapshot (v{baseline['version']}) "
                    "— rerun the operation on the current state"
                )
            if dynamic and self.group_cols:
                hit = any(
                    partition_values_of(f, self.group_cols) in touched
                    for f in c["files"]
                )
                if not hit:
                    continue
            raise ConcurrentWriteError(
                f"concurrent commit {c['dir']!r} touches rows this rewrite "
                f"(snapshot v{baseline['version']}) would erase — rerun the "
                "operation on the current state"
            )
        for bdir, bfiles in baseline["dirs"].items():
            removed = bfiles - set(cur_files.get(bdir, ()))
            if not removed:
                continue
            if dynamic and self.group_cols:
                # removals in partitions this rewrite does NOT touch are a
                # concurrent writer's own business — the rewrite never
                # re-publishes those rows, so nothing is resurrected
                hit = any(
                    partition_values_of(f, self.group_cols) in touched
                    for f in removed
                )
                if not hit:
                    continue
            raise ConcurrentWriteError(
                f"concurrent commit removed files from {bdir!r} since this "
                f"rewrite's snapshot (v{baseline['version']}) — publishing "
                "would resurrect the deleted rows; rerun on the current state"
            )

    def _collect_file_stats(self, cdir: str, files: list[str], meta=None) -> tuple[dict, dict]:
        """Per-file [min, max] for ``stats_cols`` over a just-written
        commit dir — ONE column-pruned aggregate grouped on
        ``input_file_name()`` (distributed, any filesystem, and the data
        is page-cache-hot right after the write; never a per-file driver
        footer loop). Only JSON-safe, order-comparable types are recorded
        (integrals, floats, strings — including hive partition columns);
        other types simply get no stats and are never skipped. Result is
        one row per file — driver-safe at any commit size the
        maxRecordsPerFile/compaction policy produces."""
        spark = self._session()
        r = spark.read.option("basePath", cdir)
        if meta is None:
            meta = load_meta(self.main_path, spark=self._spark)
        if meta and meta.schema:
            # same rule as _manifest_df: the sidecar schema types the hive
            # partition columns — without it the scan INFERS them (string
            # '1' dirs become ints) and the recorded stats would compare
            # against the wrong type at skip time
            r = r.schema(meta.schema)
        scan = r.parquet(*[join_path(cdir, f) for f in files])
        ok = (
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.StringType,
        )
        cols = [
            c for c in self.stats_cols
            if c in scan.columns and isinstance(scan.schema[c].dataType, ok)
        ]
        if not cols:
            return {}, {}
        aggs = [F.count(F.lit(1)).alias("__nr")]
        for c in cols:
            aggs.append(F.min(c).alias(f"__mn_{c}"))
            aggs.append(F.max(c).alias(f"__mx_{c}"))
        rows = (
            scan.select(F.input_file_name().alias("__f"), *cols)
            .groupBy("__f")
            .agg(*aggs)
            .collect()
        )
        from urllib.parse import unquote

        # O(files): split each URI on the (uuid-named, unique) commit-dir
        # segment instead of scanning the file list per row
        fileset = set(files)
        marker = "/" + cdir.rstrip("/").split("/")[-1] + "/"
        stats: dict = {}
        counts: dict = {}
        for r in rows:
            uri = unquote(r["__f"])
            pos = uri.rfind(marker)
            rel = uri[pos + len(marker):] if pos >= 0 else None
            if rel not in fileset:
                rel = next((f for f in files if uri.endswith("/" + f)), None)
            if rel is None:
                continue
            stats[rel] = {c: [r[f"__mn_{c}"], r[f"__mx_{c}"]] for c in cols}
            counts[rel] = int(r["__nr"])
        if len(stats) == len(rows):
            # every data-bearing file mapped cleanly → the remainder are
            # ZERO-ROW part files; [None, None] marks them provably
            # excludable by any comparison predicate. If any URI failed to
            # map we cannot tell empty from unmapped — record nothing for
            # the rest (conservatively never skipped).
            for f in files:
                if f not in stats:
                    stats[f] = {c: [None, None] for c in cols}
                    counts[f] = 0
        return stats, counts

    def _collect_file_blooms(self, cdir: str, files: list[str], meta=None) -> dict:
        """Per-file Bloom bitmaps for ``bloom_cols`` over a just-written
        commit — ONE distributed pass: each row contributes k md5-derived
        bit positions per indexed column (computed in SQL with the exact
        arithmetic the Python read side replays), positions dedup into a
        bounded ``collect_set`` per (file, column) — never more than
        BLOOM_BITS ints per group however large the file — and the driver
        packs each set into a base64 bitmap. NULLs contribute no
        positions (a point predicate never matches NULL). Only
        string/integral columns are indexed; others get no bloom and are
        never bloom-skipped. Returns ``(blooms, bloom_types)`` — the
        per-column Spark typeName travels in the manifest so the read
        side can canonicalize predicate values to the exact
        ``cast(col as string)`` form the bits were collected from
        (:func:`manifest.bloom_probe_key`)."""
        from .manifest import BLOOM_BITS, BLOOM_HASHES, bloom_encode

        spark = self._session()
        r = spark.read.option("basePath", cdir)
        if meta is None:
            meta = load_meta(self.main_path, spark=self._spark)
        if meta and meta.schema:
            r = r.schema(meta.schema)
        scan = r.parquet(*[join_path(cdir, f) for f in files])
        ok = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType)
        cols = [
            c for c in self.bloom_cols
            if c in scan.columns and isinstance(scan.schema[c].dataType, ok)
        ]
        if not cols:
            return {}, {}
        btypes = {c: scan.schema[c].dataType.typeName() for c in cols}

        def positions(c: str) -> F.Column:
            s = F.col(c).cast("string")
            return F.array(
                *[
                    (
                        F.conv(
                            F.substring(F.md5(F.concat(s, F.lit(f"#s{i}"))), 1, 8),
                            16,
                            10,
                        ).cast("long")
                        % BLOOM_BITS
                    )
                    for i in range(BLOOM_HASHES)
                ]
            )

        parts = [
            scan.select(
                F.input_file_name().alias("__f"),
                F.lit(c).alias("__c"),
                F.explode(positions(c)).alias("__p"),
            ).where(F.col("__p").isNotNull())
            for c in cols
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        rows = u.groupBy("__f", "__c").agg(F.collect_set("__p").alias("__ps")).collect()
        from urllib.parse import unquote

        fileset = set(files)
        marker = "/" + cdir.rstrip("/").split("/")[-1] + "/"
        blooms: dict = {}
        for row in rows:
            uri = unquote(row["__f"])
            pos = uri.rfind(marker)
            rel = uri[pos + len(marker):] if pos >= 0 else None
            if rel not in fileset:
                rel = next((f for f in files if uri.endswith("/" + f)), None)
            if rel is None:
                continue
            blooms.setdefault(rel, {})[row["__c"]] = bloom_encode(row["__ps"])
        return blooms, btypes

    def get_full_df_skipping(
        self, predicates, version: int | None = None
    ) -> DataFrame:
        """Stats-pruned scan (manifest mode): files whose recorded
        per-column [min, max] PROVE no row can satisfy the conjunctive
        ``predicates`` — ``(col, op, value)`` with op in ``==,<,<=,>,>=``
        or ``(col, 'between', lo, hi)`` — are dropped from the plan
        driver-side, before Spark lists or opens anything; the surviving
        files are then scanned WITH the same predicates applied, so the
        result is exact regardless of stats coverage (files or columns
        without stats are conservatively kept). This is the
        Delta/Iceberg data-skipping shape: at 100 TB a time- or
        key-clustered table answers a narrow range query by opening a
        handful of files instead of planning the full file list."""
        from .manifest import file_may_match, norm_predicates

        preds = norm_predicates(predicates)
        tr = self._epoch_pred_translator()
        pol = self._policy() if self.governed else {}
        masked = {k.split(".")[0] for k in (pol.get("column_masks") or {})}
        # governed handles: the exact predicates evaluate over GOVERNED
        # values below (a raw-value predicate would leak membership of
        # masked values through row presence), so file-level pruning may
        # only use predicates on UNMASKED columns — their values are
        # identical pre/post policy, and the row filter only shrinks the
        # row set, so raw min/max pruning stays superset-safe
        skip_preds = [p for p in preds if p[0] not in masked] if masked else preds

        def keep(c: dict, f: str) -> bool:
            return file_may_match(c, f, tr(c, skip_preds))

        df = self._manifest_df(version, file_keep=keep)
        if self.governed:
            df = self._apply_policy(df, pol)
        for p in preds:
            col = F.col(p[0])
            if p[1] == "between":
                df = df.where((col >= F.lit(p[2])) & (col <= F.lit(p[3])))
            elif p[1] == "in":
                df = df.where(col.isin(list(p[2])))
            else:
                cond = {
                    "==": col == F.lit(p[2]),
                    "<": col < F.lit(p[2]),
                    "<=": col <= F.lit(p[2]),
                    ">": col > F.lit(p[2]),
                    ">=": col >= F.lit(p[2]),
                }[p[1]]
                df = df.where(cond)
        return df

    def index_stats(self, version: int | None = None) -> DataFrame:
        """The manifest's file-level index as a DataFrame — one row per
        (file, indexed column): recorded [min, max] and whether a Bloom
        bitmap exists. Read entirely from the (tiny) manifest JSON; no
        data files are touched. The observability face of S24: what WOULD
        a predicate be able to prune, per file."""
        self._refuse_leaky_metadata("index_stats")
        if self.commit_mode != "manifest":
            raise TypeError("index_stats() requires commit_mode='manifest'")
        from .manifest import effective_commits, load_manifest

        mf = load_manifest(self._fs(), self.main_path, version)
        if version is not None and mf is None:
            raise KeyError(f"no manifest version {version} for {self.name}")
        rows = []
        for c in effective_commits((mf or {}).get("commits", []), self.group_cols):
            blooms = c.get("blooms") or {}
            for f in c["files"]:
                st = (c.get("stats") or {}).get(f) or {}
                fb = blooms.get(f) or {}
                for col in sorted(set(st) | set(fb)):
                    mnmx = st.get(col) or [None, None]
                    rows.append(
                        (
                            f,
                            col,
                            None if mnmx[0] is None else str(mnmx[0]),
                            None if mnmx[1] is None else str(mnmx[1]),
                            col in fb,
                        )
                    )
        return self._session().createDataFrame(
            rows,
            "file string, column string, min_value string, max_value string, has_bloom boolean",
        )

    def files_df(self, version: int | None = None) -> DataFrame:
        """The Iceberg-``table.files`` / Delta-``DESCRIBE DETAIL`` shape:
        one row per LIVE data file of a snapshot, straight from the
        manifest JSON — file path, owning commit dir, commit kind,
        hive-parsed partition values, and the recorded per-file rowcount
        (null for commits predating stats collection). No data files are
        touched: on a million-file table this is still a driver-side read
        of KB-sized JSON (plus spilled list objects), making it the cheap
        join target for maintenance planning, audit dashboards, and
        "which files hold partition X" questions that would otherwise
        cost an O(files) listing."""
        self._refuse_leaky_metadata("files_df")
        if self.commit_mode != "manifest":
            raise TypeError("files_df() requires commit_mode='manifest'")
        from .manifest import effective_commits, load_manifest, partition_values_of

        mf = load_manifest(self._fs(), self.main_path, version)
        if version is not None and mf is None:
            raise KeyError(f"no manifest version {version} for {self.name}")
        gcols = list(self.group_cols)
        rows = []
        for c in effective_commits((mf or {}).get("commits", []), self.group_cols):
            nr = c.get("rows") or {}
            for f in c["files"]:
                pv = partition_values_of(f, gcols) if gcols else None
                rows.append(
                    (
                        f,
                        c["dir"],
                        c.get("kind", "data"),
                        dict(zip(gcols, pv)) if pv is not None else {},
                        nr.get(f),
                    )
                )
        return self._session().createDataFrame(
            rows,
            "file string, commit_dir string, kind string, "
            "partition map<string,string>, n_rows long",
        )

    def skip_plan(self, predicates, version: int | None = None) -> tuple[int, int]:
        """(files kept, files total) for ``predicates`` under the current
        stats — the observability hook for how selective a skipping scan
        will be, computed from the manifest alone (no data files touched)."""
        self._refuse_leaky_metadata("skip_plan")
        from .manifest import effective_commits, file_may_match, load_manifest, norm_predicates

        preds = norm_predicates(predicates)
        mf = load_manifest(self._fs(), self.main_path, version)
        if version is not None and mf is None:
            # same contract as the read path: an explicitly requested
            # missing (vacuumed/never-committed) version is an error, not
            # an empty plan
            raise KeyError(f"no manifest version {version} for {self.name}")
        tr = self._epoch_pred_translator()
        kept = total = 0
        for c in effective_commits((mf or {}).get("commits", []), self.group_cols):
            for f in c["files"]:
                total += 1
                if file_may_match(c, f, tr(c, preds)):
                    kept += 1
        return kept, total

    def _epoch_pred_translator(self):
        """Per-commit predicate rewriter for stats skipping across schema
        epochs: a commit's stats/bloom maps are keyed by the column names
        CURRENT WHEN IT WAS WRITTEN, so after a rename_column the current
        predicate name must map back (by field id) to that epoch's name
        or pruning silently stops for every pre-rename file. Predicates
        on columns that did not exist in a commit's epoch are dropped for
        that commit (its stats can prove nothing about them — the other
        conjuncts still prune); no schema log → identity."""
        from .schema_log import load_schema_log

        slog = load_schema_log(self._fs(), self.main_path)
        if not slog:
            return lambda c, preds: preds
        cur = slog[-1]
        epochs = {e["v"]: e for e in slog}
        maps: dict[int, dict] = {}

        def translate(c: dict, preds: list[tuple]) -> list[tuple]:
            cv = c.get("schema_v", 1)
            if cv == cur["v"]:
                return preds
            m = maps.get(cv)
            if m is None:
                byid = {
                    f["id"]: f["name"]
                    for f in (epochs.get(cv) or {}).get("fields", [])
                }
                m = {f["name"]: byid.get(f["id"]) for f in cur["fields"]}
                maps[cv] = m
            out = []
            for p in preds:
                nm = m.get(p[0], p[0])
                if nm is not None:
                    out.append((nm,) + tuple(p[1:]))
            return out

        return translate

    def _drop_partitions_from_manifest(
        self, group_value_tuples: set[tuple], rmw_baseline: dict | None = None
    ) -> None:
        """Manifest-mode partition delete: publish a version whose file
        list excludes the partitions — data files stay until vacuum."""
        from .manifest import load_manifest, prune_partitions, try_commit

        fs = self._fs()
        from .manifest import hive_value

        touched = {tuple(hive_value(v) for v in gv) for gv in group_value_tuples}
        while True:
            cur = load_manifest(fs, self.main_path)
            if cur is None:
                return
            if rmw_baseline is not None:
                # our rewrite computed these partitions EMPTY from its
                # snapshot — a commit landed since with rows in one of
                # them would be silently erased by this drop
                self._check_rmw_conflict(rmw_baseline, cur["commits"], True, touched)
            self._assert_uniform_spec(cur["commits"])
            nxt = {
                "version": cur["version"] + 1,
                "commits": prune_partitions(cur["commits"], self.group_cols, touched),
                "spec": list(self.group_cols),
                "op": "drop-partitions",
            }
            if try_commit(fs, self.main_path, nxt, prev_ts=cur.get("ts", 0.0)):
                return

    def sweep_aborted_txns(self) -> int:
        """Physically drop manifest entries whose multi-table transaction
        ABORTED (see :mod:`.txn`). Readers already ignore them (the
        visibility gate), so this is pure reclamation: once the entries
        leave the latest manifest their data dirs become unreferenced and
        :meth:`vacuum` sweeps the bytes at the retention horizon. Entries
        of PENDING transactions are untouched — only an explicit abort
        marker (or a commit) decides a txn, never a sweep. Returns the
        number of entries dropped. One manifest CAS, no data I/O."""
        if self.commit_mode != "manifest":
            raise TypeError("sweep_aborted_txns requires commit_mode='manifest'")
        from .manifest import load_manifest, try_commit, txn_state

        fs = self._fs()
        while True:
            cur = load_manifest(fs, self.main_path)
            if cur is None:
                return 0
            keep, dropped = [], 0
            for c in cur["commits"]:
                if (
                    "txn" in c
                    and "fence" not in c
                    and txn_state(c["txn"]) == "aborted"
                ):
                    dropped += 1
                    continue
                keep.append(c)
            if not dropped:
                return 0
            nxt = {
                "version": cur["version"] + 1,
                "commits": keep,
                "spec": cur.get("spec", list(self.group_cols)),
                "op": "txn-sweep",
            }
            if try_commit(fs, self.main_path, nxt, prev_ts=cur.get("ts", 0.0)):
                return dropped

    HOLDS_DIR = "holds"

    def register_retention_hold(self, name: str, version: int | None = None) -> None:
        """Pin manifests (and the data dirs they reference) from
        ``version`` ONWARD against :meth:`vacuum` — the
        vacuum-vs-streaming-checkpoint guard (round-7 verdict #7).
        Streams register/advance one automatically per micro-batch when
        opened with ``hold=`` (stream_manifest / stream_changes): the
        hold tracks the checkpoint horizon, so a retention sweep can
        never prune the manifest a resume needs — PREVENTION, where the
        previous contract was a clear error after the fact (a
        re-bootstrap at 100 TB is days). Holds carry a timestamp and
        EXPIRE by age (``vacuum(hold_expiry_seconds=)``): an abandoned
        consumer cannot pin retention forever. Manual registration
        covers non-streaming readers (a long backfill over a pinned
        version range)."""
        if self.commit_mode != "manifest":
            raise TypeError("retention holds require commit_mode='manifest'")
        if "/" in name or name.startswith("."):
            raise ValueError(f"bad hold name {name!r}")
        import json as _json
        import time as _time

        from .manifest import MANIFEST_DIR

        if version is None:
            vs = self.versions()
            version = vs[-1] if vs else 1
        fs = self._fs()
        d = join_path(self.main_path, MANIFEST_DIR, self.HOLDS_DIR)
        fs.mkdirs(d)
        fs.write_text_atomic(
            join_path(d, f"{name}.json"),
            _json.dumps({"version": int(version), "ts": _time.time()}),
        )

    def release_retention_hold(self, name: str) -> None:
        from .manifest import MANIFEST_DIR

        fs = self._fs()
        p = join_path(self.main_path, MANIFEST_DIR, self.HOLDS_DIR, f"{name}.json")
        if fs.exists(p):
            fs.delete(p)

    def retention_holds(self) -> dict[str, dict]:
        """Live hold markers as ``{name: {version, ts}}`` (malformed
        markers surface as version-1 pins — fail-SAFE: a half-written
        marker must hold, not free)."""
        import json as _json

        from .fs import basename
        from .manifest import MANIFEST_DIR

        fs = self._fs()
        d = join_path(self.main_path, MANIFEST_DIR, self.HOLDS_DIR)
        out = {}
        if not fs.exists(d):
            return out
        for p in fs.list_files(d, ".json"):
            name = basename(p)[: -len(".json")]
            try:
                out[name] = _json.loads(fs.read_text(p))
            except Exception:
                out[name] = {"version": 1, "ts": None}
        return out

    def _held_versions(
        self, expiry: float, versions: list[int], sweep_expired: bool = False
    ) -> set[int]:
        import json as _json
        import time as _time

        from .manifest import MANIFEST_DIR

        now = _time.time()
        fs = self._fs()
        d = join_path(self.main_path, MANIFEST_DIR, self.HOLDS_DIR)
        live_mins = []
        if fs.exists(d):
            for p in fs.list_files(d, ".json"):
                try:
                    h = _json.loads(fs.read_text(p))
                    ts, v = float(h["ts"]), int(h["version"])
                except Exception:
                    # half-written marker (racing a stream's commit):
                    # treat as a live hold-everything pin, never free
                    ts, v = now, versions[0] if versions else 1
                if ts >= now - expiry:
                    live_mins.append(v)
                elif sweep_expired:
                    fs.delete(p)
        if not live_mins:
            return set()
        vmin = min(live_mins)
        return {v for v in versions if v >= vmin}

    def vacuum(
        self,
        max_age_seconds: float = 24 * 3600,
        keep_versions: int = 1,
        hold_expiry_seconds: float = 7 * 24 * 3600,
    ) -> list[str]:
        """Delete orphaned two-phase-append staging dirs older than
        ``max_age_seconds`` — the maintenance sweep for writers that
        crashed mid-append. Readers never see staging (dot-prefixed), so
        orphans cost only storage; but on a table under constant streaming
        append pressure they accumulate forever without this.

        The age threshold is the safety contract: set ``max_age_seconds``
        longer than any append's write phase could run (the dir mtime is
        set at staging creation, not refreshed while tasks write under
        it), and run vacuum only where mtimes are trustworthy — S3-class
        stores synthesize directories and may report epoch-0 mtimes, so
        entries with non-positive mtime are SKIPPED rather than treated
        as infinitely old (on such stores the two-phase append is already
        documented as degraded; use single_writer there). Returns the
        deleted paths.

        ``keep_versions`` (manifest mode) retains the newest N manifest
        versions AND every data dir they reference — the retention knob
        that keeps time travel, change feeds, and streaming-source
        offsets alive across vacuums: set it at least as deep as the
        slowest consumer's checkpoint lag (the vacuum-vs-streaming
        caveat, now tunable instead of absolute)."""
        self._assert_ungoverned("vacuum")
        import time as _time

        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1 (the latest always survives)")
        fs = self._fs()
        cutoff = _time.time() - max_age_seconds
        deleted = []
        for path, mtime in fs.list_dirs(self.main_path, prefix=".pqrs_staging_"):
            if 0 < mtime < cutoff:
                fs.delete(path)
                deleted.append(path)
        if self.commit_mode == "manifest":
            deleted += self._vacuum_manifest(
                cutoff, keep_versions, hold_expiry_seconds
            )
        return deleted

    def _vacuum_manifest(
        self,
        cutoff: float,
        keep_versions: int = 1,
        hold_expiry_seconds: float = 7 * 24 * 3600,
    ) -> list[str]:
        """Manifest-mode sweep: (a) commit dirs referenced by NO retained
        manifest and older than the cutoff — superseded by later
        overwrites/compactions, or stranded by a writer that crashed
        between data write and CAS; (b) manifest versions below the
        retained window, so time travel's retention window IS the vacuum
        cadence. The age threshold protects in-flight commits exactly as
        it does staging dirs: a live writer's data dir is younger than
        any sane cutoff."""
        from .fs import STAGING_DIR
        from .fs import basename as _bn
        from .manifest import DATA_DIR, MANIFEST_DIR, list_versions, load_manifest

        fs = self._fs()
        deleted = []
        # stranded CAS/atomic-write tmps (writer crashed between staging
        # and rename) live in a .staging dir under the DESTINATION's
        # parent — which is not just the manifest dir: spilled lists land
        # in lists/.staging, tags in tags/.staging, sidecar/branch
        # markers in the root's own .staging. The dir's mtime advances on
        # every create/rename in it, so an old mtime means no in-flight
        # write; sweep each whole dir (recreated on next write).
        for parent in (
            join_path(self.main_path, MANIFEST_DIR),
            join_path(self.main_path, MANIFEST_DIR, "lists"),
            join_path(self.main_path, MANIFEST_DIR, "tags"),
            join_path(self.main_path, MANIFEST_DIR, self.HOLDS_DIR),
            self.main_path,
        ):
            for path, mtime in fs.list_dirs(parent, prefix=STAGING_DIR):
                if 0 < mtime < cutoff:
                    fs.delete(path)
                    deleted.append(path)
        versions = list_versions(fs, self.main_path)
        window = set(versions[-keep_versions:]) if versions else set()
        # tags pin snapshots OUTSIDE the retention window: a tagged
        # version keeps its manifest, its spilled lists, and its data
        # dirs alive until the tag is deleted
        tagged = {v for v in self.tags().values() if v in versions}
        # retention HOLDS pin everything from a consumer's checkpoint
        # horizon onward (streams advance theirs per committed batch);
        # stale holds expire by age and are swept here
        held = self._held_versions(
            hold_expiry_seconds, versions, sweep_expired=True
        )
        retained = sorted(window | tagged | held)
        live_dirs = set()
        live_refs = set()
        for v in retained:
            mf = load_manifest(fs, self.main_path, v)
            for c in (mf or {}).get("commits", []):
                live_dirs.add(c["dir"].split("/")[-1])
                if "files_ref" in c:
                    live_refs.add(c["files_ref"].rsplit("/", 1)[-1])
        # branch heads shallow-reference MAIN data dirs (base ==
        # main_path on their inherited entries): protect those dirs and
        # their spilled lists for as long as the branch exists
        for bname in self.branches():
            bmf = load_manifest(fs, self._branch_root(bname))
            for c in (bmf or {}).get("commits", []):
                if c.get("base") == self.main_path:
                    live_dirs.add(c["dir"].split("/")[-1])
                    if "files_ref" in c:
                        live_refs.add(c["files_ref"].rsplit("/", 1)[-1])
        for path, mtime in fs.list_dirs(join_path(self.main_path, DATA_DIR)):
            if _bn(path) not in live_dirs and 0 < mtime < cutoff:
                fs.delete(path)
                deleted.append(path)
        for v in versions:
            if v in retained:
                continue
            p = join_path(self.main_path, MANIFEST_DIR, f"v{v:020d}.json")
            fs.delete(p)
            deleted.append(p)
        # spilled payload objects (manifest-of-manifests tier) referenced
        # by NO retained version (live_refs was collected in the single
        # retained-version walk above): shared-by-ref across versions, so
        # only sweep once every referencing version is gone; the age
        # cutoff protects a payload spilled by an in-flight commit that
        # has not CAS'd yet (same contract as stranded data dirs)
        for path, mtime in fs.list_files_mtimes(
            join_path(self.main_path, MANIFEST_DIR, "lists"), ".json"
        ):
            if _bn(path) not in live_refs and 0 < mtime < cutoff:
                fs.delete(path)
                deleted.append(path)
        return deleted

    def _delete_partition_dir(self, group_values: tuple) -> None:
        if self.commit_mode == "manifest":
            self._drop_partitions_from_manifest({tuple(group_values)})
            return
        from .manifest import hive_value

        parts = [f"{c}={hive_value(v)}" for c, v in zip(self.group_cols, group_values)]
        self._fs().delete(join_path(self.main_path, *parts))

    def _snapshot_df(self, rmw: dict | None) -> DataFrame:
        """The table as of the RMW baseline snapshot — read planning
        reuses the baseline's already-loaded manifest, so the conflict
        check and the rewrite computation provably see the same version
        (and each keyed write pays ONE manifest load, not two)."""
        if rmw is not None and self.commit_mode == "manifest" and rmw["manifest"] is not None:
            return self._manifest_df(None, preloaded=rmw["manifest"])
        return self.get_full_df()

    def _rmw_baseline(self) -> dict | None:
        """Snapshot (version, commit-dir set) BEFORE a read-modify-write
        op reads the table — the optimistic-concurrency baseline its
        publish checks against (see ConcurrentWriteError). None in files
        mode (no snapshot to anchor on; documented unprotected)."""
        if self.commit_mode != "manifest":
            return None
        from .manifest import effective_commits, load_manifest

        mf = load_manifest(self._fs(), self.main_path)
        return {
            # the loaded manifest rides along so the op's read-back scan
            # is planned against EXACTLY this snapshot (and the second
            # manifest load per keyed write disappears)
            "manifest": mf,
            "version": mf["version"] if mf else 0,
            # per-dir FILE SETS, not just the dir set: a concurrent
            # operation that only REMOVES files (a delete/merge emptying a
            # partition publishes a prune-only commit — dirs unchanged or
            # merely vanished) must be detectable, or this rewrite would
            # silently resurrect the deleted rows (see _check_rmw_conflict).
            # VISIBLE commits only: an entry gated on a pending multi-table
            # txn contributed no rows to this rewrite's read, so it must
            # look "new" at publish time — whether it is still pending
            # (pruning it would destroy the txn's data) or has committed
            # since (its rows were never read) — and conflict either way.
            "dirs": {
                c["dir"]: frozenset(c["files"])
                for c in effective_commits((mf or {}).get("commits", []), self.group_cols)
            },
        }

    def _write(self, df: DataFrame, mode: str, dynamic: bool = True, fence: tuple | None = None, rmw_baseline: dict | None = None, prune: set | None = None) -> None:
        self._assert_ungoverned("write")
        if fence is not None and self.commit_mode != "manifest":
            raise TypeError("fenced (exactly-once) writes need commit_mode='manifest'")
        meta = load_meta(self.main_path, spark=self._spark)
        df = self._apply_clustering(df)
        if self.commit_mode == "manifest":
            self._write_manifest(
                df, mode=mode, dynamic=dynamic, fence=fence, meta=meta,
                rmw_baseline=rmw_baseline, prune=prune,
            )
            return
        if mode == "append" and not self.single_writer:
            # two-phase append: concurrent direct appends to one root are
            # NOT safe — all jobs share the committer's _temporary/0
            # staging dir and one job's commit cleanup deletes the other's
            # in-flight attempts. Each append therefore commits into its
            # own hidden staging dir under the root (invisible to readers:
            # Spark ignores dot-prefixed paths) and then renames the
            # finished files into place — same-filesystem renames of
            # uniquely-named immutable files, so interleaved appends
            # compose and a crashed append leaves only an ignorable
            # staging dir, never partial visible data. A table declared
            # single_writer skips all of this and pays one plain write job.
            self._two_phase_append(df)
            return
        w = df.write.mode(mode)
        if self.group_cols:
            w = w.partitionBy(*self.group_cols)
        if self.max_records:
            w = w.option("maxRecordsPerFile", self.max_records)
        if self.compression:
            w = w.option("compression", self.compression)
        if mode == "overwrite":
            w = w.option("partitionOverwriteMode", "dynamic" if dynamic else "static")
        w.parquet(self.main_path)
        # a static overwrite wipes the table root, sidecar included — restore
        if meta is not None and load_meta(self.main_path, spark=self._spark) is None:
            save_meta(self.main_path, meta, spark=self._spark)
        if prune:
            # partitions the rewrite left empty (dynamic overwrite cannot
            # express "now empty") — files mode clears the dirs directly
            for gv in prune:
                self._delete_partition_dir(tuple(gv))

    def _apply_clustering(self, df: DataFrame) -> DataFrame:
        if self.cluster_by:
            # data clustering for scan skipping: each write task's rows
            # arrive sorted on the cluster keys, so parquet row-group (and
            # file) min/max stats are tight and a filtered read skips
            # whole row groups. 'sort' = lexicographic (tightens the FIRST
            # key); 'zorder' = Morton-interleaved bits of ALL keys, so
            # filters on any clustered dimension skip (functions/zorder.py).
            # No shuffle either way: the sort is per-partition.
            if self.cluster_algo == "zorder" and len(self.cluster_by) >= 2:
                from ..functions.zorder import scale_to_bits, zorder_value

                # the stats pass and the write both execute the incoming
                # lineage — materialize once so an expensive upstream plan
                # isn't computed twice per append
                df = df.localCheckpoint(eager=True)
                # one tiny min/max aggregate over the write batch supplies
                # the scaling ranges (same pre-write pass Delta's OPTIMIZE
                # ZORDER pays); 63 // n keys bounds the interleave width
                aggs = []
                for c in self.cluster_by:
                    aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
                st = df.agg(*aggs).first()
                bits = min(16, 63 // len(self.cluster_by))
                try:
                    scaled = [
                        scale_to_bits(
                            F.col(c), st[f"__mn_{c}"], st[f"__mx_{c}"], bits=bits
                        )
                        for c in self.cluster_by
                    ]
                except (TypeError, ValueError):
                    # empty batch (mins are None), an all-NULL key, or a
                    # non-numeric key the 'sort' algo would accept: fall
                    # back to lexicographic clustering instead of failing
                    # the append
                    df = df.sortWithinPartitions(*(self.group_cols + self.cluster_by))
                else:
                    df = (
                        df.withColumn("__pqr_z", zorder_value(scaled, bits=bits))
                        .sortWithinPartitions(*(self.group_cols + ["__pqr_z"]))
                        .drop("__pqr_z")
                    )
            else:
                df = df.sortWithinPartitions(*(self.group_cols + self.cluster_by))
        return df


class StagedCommit:
    """Handle for a write-audit-publish stage (``TableRepo.stage_extend``).

    The staged data files already sit in their final ``_pqrs_data/<uuid>``
    location with their manifest entry (files, spec, stats, blooms) fully
    built — the only thing between them and visibility is the manifest
    CAS. Exactly one of :meth:`publish` / :meth:`abort` may be called."""

    def __init__(self, repo: TableRepo, entry: dict):
        self._repo = repo
        self._entry = entry
        self._state = "staged"

    @property
    def files(self) -> list[str]:
        """Relative paths of the staged data files."""
        return list(self._entry["files"])

    def dataframe(self) -> DataFrame:
        """The staged batch, read back from exactly the files that would
        become visible — the audit surface. Typed by the table's sidecar
        schema like any committed read (partition dirs are not
        re-inferred)."""
        self._check("dataframe")
        repo = self._repo
        spark = repo._session()
        meta = load_meta(repo.main_path, spark=repo._spark)
        cdir = join_path(repo.main_path, self._entry["dir"])
        r = spark.read
        if meta and meta.schema:
            r = r.schema(meta.schema)
        files = [join_path(cdir, f) for f in self._entry["files"]]
        if not files:
            return repo.get_full_df().limit(0)
        return r.option("basePath", cdir).parquet(*files)

    def publish(self, mode: str = "append") -> None:
        """Flip the staged entry into the table: ``append`` adds it,
        ``replace_groups`` dynamically overwrites exactly the partitions
        present in the staged batch (grouped tables only). Runs the same
        optimistic CAS retry loop as a direct commit — concurrent
        publishes and commits compose."""
        self._check("publish")
        repo = self._repo
        if mode == "append":
            op = "txn-overwrite" if self._entry.get("ow") else "wap-append"
            repo._publish_entry(self._entry, "append", dynamic=False, op=op)
        elif mode == "replace_groups":
            if not repo.group_cols:
                raise TypeError("not a grouped table")
            repo._publish_entry(self._entry, "overwrite", dynamic=True, op="wap-replace-groups")
        else:
            raise ValueError(f"mode must be append|replace_groups: {mode!r}")
        self._state = "published"

    def abort(self) -> None:
        """Discard the stage: delete the staged data dir. The table never
        saw it; nothing to roll back."""
        self._check("abort")
        repo = self._repo
        repo._fs().delete(join_path(repo.main_path, self._entry["dir"]))
        self._state = "aborted"

    def _check(self, op: str) -> None:
        if self._state != "staged":
            raise RuntimeError(f"cannot {op}: staged commit already {self._state}")
