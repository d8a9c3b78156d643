"""Stream a manifest-mode TableRepo as a Structured Streaming SOURCE —
the Delta-style "stream the transaction log" shape.

``TableRepo.stream()`` (directory-listing file stream) is refused in
manifest mode because visibility there is the manifest, not the
directory. This source closes that gap: the streaming OFFSET is the
manifest VERSION, each micro-batch emits the rows of files ADDED between
two committed versions (set difference of the two immutable manifests —
never a directory listing), and replay is exactly-once by construction:
``readBetweenOffsets(v1, v2)`` re-derives the identical file set from the
identical JSONs. Appends stream naturally; an overwrite surfaces only its
newly-written files (the ``ignoreChanges`` contract Delta documents —
removed files are not retracted); a ``restore`` re-exposes only commits
the start offset predates.

Scale/retention notes, honestly stated:

- This is the ``SimpleDataSourceStreamReader`` flavor: batches are
  materialized driver-side (then pickled into the checkpoint prefetch
  cache). Right for control-plane-sized increments (the micro-batch
  ingest cadence the writers in this repo produce); the partition-based
  ``DataSourceStreamReader`` handing file splits to executors is the
  known upgrade for fat commits.
- Offset replay needs the manifests at BOTH offsets retained: vacuuming
  manifests below a live stream's checkpoint horizon breaks recovery
  (same caveat as Delta vacuum vs. streaming) — a clear error is raised
  rather than silently re-reading the world.
- All listing/JSON/parquet access resolves through ``pyarrow.fs`` (driver
  AND executors — no JVM dependence), so any URI TableRepo can write is
  streamable: plain paths, ``file://``, and every object-store scheme
  pyarrow reaches in the deployment (s3://, hdfs://, gcs://…). A scheme
  pyarrow cannot build a filesystem for fails loudly at construction,
  never as a silently-empty stream.
"""

from __future__ import annotations

FORMAT_NAME = "pqrs_manifest_stream"


def manifest_stream_source():
    """Build the DataSource class; factory-scoped so cloudpickle ships it
    by value (no executor/driver dependence on this package's sys.path)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class _Reader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            import json
            import re

            # paths resolve through pyarrow.fs (works on executors —
            # no JVM needed — and speaks every URI scheme pyarrow
            # supports: file://, s3://, hdfs://, gcs://…), so the stream
            # reads any root TableRepo can write. The ORIGINAL uri is
            # kept for per-commit base resolution (shallow clones record
            # donor roots verbatim, possibly on a different store).
            self.root_uri = options["root"]
            self.fs, self.root = self._resolve(self.root_uri)
            self.cols = options["cols"].split(",")
            self.types = options["col_types"].split(",")
            # declared Spark types, preferred over the comma-split
            # col_types strings: a nested simpleString contains commas
            # (map<string,int>) so the split misaligns past it, and the
            # pylist→row conversion needs the DECLARED type to tell an
            # empty MAP ([] from to_pylist) apart from an empty array —
            # sniffing (k,v) tuples can't (empty maps have none).
            # StructType.fromJson is pure Python (no JVM), safe on
            # executor workers too.
            self.schema_st = None
            sj = options.get("schema_json")
            if sj:
                from pyspark.sql.types import StructType

                self.schema_st = StructType.fromJson(json.loads(sj))
                self.types = [
                    f.dataType.simpleString() for f in self.schema_st.fields
                ]
            # optional stats-pruned SUBSCRIPTION: files whose recorded
            # [min,max] provably cannot match these conjuncts never enter
            # a micro-batch (file-level pruning only — exact row filters
            # stay with the caller)
            sp = options.get("skip_preds")
            self.skip_preds = [tuple(p) for p in json.loads(sp)] if sp else None
            # CDF mode (TableRepo.stream_changes): per-version file
            # diffs stream as insert/delete rows with _change_type and
            # _commit_version pseudo-columns filled reader-side
            self.cdf = options.get("cdf") == "1"
            # versions-meta mode: one row PER COMMITTED VERSION (version,
            # ts, op, commit/file counts) from the manifest JSONs alone —
            # no data file is ever opened. The audit feed, and the
            # metadata-weight trigger MaterializedAggView.refresh_stream
            # pumps (offsets/frontier rules identical to the data feeds)
            self.meta_only = options.get("versions_meta") == "1"
            # first version whose changes stream (resolved by
            # stream_changes from starting_version=); the version BEFORE
            # it is the initial offset, and if that manifest is vacuumed
            # the start version replays as a FULL-snapshot bootstrap
            self.cdf_start = int(options.get("cdf_start", "1"))
            # per-version file sets memoized for the CDF walk — manifests
            # are immutable, and without this every micro-batch re-reads
            # O(versions) manifest JSONs plus their spilled payloads
            self._fset_cache = {}
            self._dv_cache = {}
            # commit dir -> schema epoch stamp (immutable per dir) and the
            # lazily-read schema log: files written under an OLDER epoch
            # must stream with their columns mapped by field id — exactly
            # the batch read path's rule — or a rename would silently
            # null every pre-rename file in the feed
            self._dir_sv = {}
            self._slog_cache = None
            # per-version list of txn markers (immutable: the version
            # JSON never changes) — makes the per-poll frontier scan a
            # dict lookup except for still-pending markers
            self._txn_marker_cache = {}
            # named RETENTION HOLD: when set, every committed offset
            # advances a hold marker in the table's manifest dir, so
            # vacuum() cannot prune the manifests a checkpoint resume
            # needs (the vacuum-vs-streaming guard; holds expire by age)
            # same name rule register_retention_hold enforces: a '/' or
            # leading '.' would write the marker OUTSIDE the holds dir,
            # where _held_versions never looks — the checkpoint would be
            # silently unprotected against vacuum
            self.hold_name = options.get("retention_hold") or None
            if self.hold_name and (
                "/" in self.hold_name or self.hold_name.startswith(".")
            ):
                raise ValueError(f"bad hold name {self.hold_name!r}")

        def commit(self, end):
            # offset-commit callback (driver-side): advance this
            # consumer's retention hold to the committed horizon.
            # Belt-and-braces with the read()-time pin — under
            # availableNow the engine may deliver commit() only on the
            # NEXT run, so the pin is what protects a fresh checkpoint
            self._advance_hold(int(end["v"]))

        def _advance_hold(self, version: int):
            if not self.hold_name:
                return
            import json as _json
            import time as _time

            from parquetranger_spark.sources.fs import fs_for, join_path

            fs = fs_for(self.root_uri)
            d = join_path(self.root_uri, "_pqrs_manifest", "holds")
            fs.mkdirs(d)
            fs.write_text_atomic(
                join_path(d, f"{self.hold_name}.json"),
                _json.dumps({"version": int(version), "ts": _time.time()}),
            )

        _FS_CACHE: dict = {}
        # marker path → resolved outcome; markers are written exactly once
        # (create_exclusive) so resolved states are immutable, like _FS_CACHE
        _TXN_CACHE: dict = {}

        @classmethod
        def _resolve(cls, p: str):
            """``(pyarrow filesystem, within-fs path)`` for a root/base —
            plain paths map to LocalFileSystem, URIs go through
            ``pyarrow.fs.FileSystem.from_uri`` (file:// strips to a local
            path; object-store schemes get their real client);
            ``webhdfs://`` gets a self-contained pure-Python REST reader
            (:func:`_webhdfs_pafs`) — HDFS clusters expose WebHDFS even
            where libhdfs isn't installable in the Python workers, and
            the in-container object-store contract test serves the same
            protocol from a stub. Only a scheme nothing can construct a
            filesystem for is refused — LOUDLY, never as a
            silently-empty stream. Resolutions are memoized per URI
            (class-level, so per-file loops and per-task reads never
            rebuild an object-store client per file)."""
            import re

            from pyarrow.fs import FileSystem, LocalFileSystem

            hit = cls._FS_CACHE.get(p)
            if hit is not None:
                return hit
            m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]+):/+", p)
            if not m:
                out = (LocalFileSystem(), p)
            elif m.group(1).lower() == "webhdfs":
                out = cls._webhdfs_pafs(p)
            else:
                try:
                    out = FileSystem.from_uri(p)
                except Exception as e:
                    raise NotImplementedError(
                        f"stream_manifest: unreachable path scheme "
                        f"{m.group(1)!r} ({e}) — pyarrow.fs has no filesystem "
                        "for this URI in the current environment"
                    )
            cls._FS_CACHE[p] = out
            return out

        @staticmethod
        def _webhdfs_pafs(p: str):
            """(PyFileSystem over a WebHDFS REST handler, within-fs path).

            Read-only and deliberately minimal: the streaming source only
            stats, lists and reads (manifest JSONs + parquet data files).
            ``open_input_file`` fetches the whole object into a
            BufferReader — manifest artifacts are KBs and the per-task
            data files the stream reads are single row-group parquet, so
            ranged-read plumbing buys nothing here; S3/GCS-class stores
            never take this branch (pyarrow has native clients). Defined
            closure-local so the data source stays self-contained on
            executors (no package imports)."""
            import json as _json
            import urllib.error
            import urllib.parse
            import urllib.request

            import pyarrow as pa
            from pyarrow.fs import (
                FileInfo,
                FileSystemHandler,
                FileType,
                PyFileSystem,
            )

            netloc, _, tail = p.split("://", 1)[1].partition("/")
            within = "/" + tail
            api = f"http://{netloc}/webhdfs/v1"

            def call(path, op, **params):
                qs = "&".join(
                    [f"op={op}"]
                    + [f"{k}={urllib.parse.quote(str(v))}" for k, v in params.items()]
                )
                with urllib.request.urlopen(
                    f"{api}{urllib.parse.quote(path)}?{qs}"
                ) as r:
                    return r.read()

            def info_of(path, st):
                typ = (
                    FileType.Directory if st["type"] == "DIRECTORY" else FileType.File
                )
                return FileInfo(
                    path, typ, size=st["length"], mtime_ns=st["modificationTime"] * 1_000_000
                )

            class _H(FileSystemHandler):
                def get_type_name(self):
                    return f"webhdfs[{netloc}]"

                def __eq__(self, other):
                    return isinstance(other, _H) and other.get_type_name() == self.get_type_name()

                def __ne__(self, other):
                    return not self.__eq__(other)

                def get_file_info(self, paths):
                    out = []
                    for path in paths:
                        try:
                            st = _json.loads(call(path, "GETFILESTATUS"))["FileStatus"]
                            out.append(info_of(path, st))
                        except urllib.error.HTTPError as e:
                            if e.code == 404:
                                out.append(FileInfo(path, FileType.NotFound))
                            else:
                                raise
                    return out

                def get_file_info_selector(self, selector):
                    base = selector.base_dir
                    try:
                        sts = _json.loads(call(base, "LISTSTATUS"))["FileStatuses"][
                            "FileStatus"
                        ]
                    except urllib.error.HTTPError as e:
                        if e.code == 404:
                            if selector.allow_not_found:
                                return []
                            raise FileNotFoundError(base)
                        raise
                    out = []
                    for st in sts:
                        path = base.rstrip("/") + "/" + st["pathSuffix"]
                        fi = info_of(path, st)
                        out.append(fi)
                        if selector.recursive and st["type"] == "DIRECTORY":
                            sub = type(selector)(path, recursive=True, allow_not_found=True)
                            out.extend(self.get_file_info_selector(sub))
                    return out

                def open_input_stream(self, path):
                    return pa.BufferReader(call(path, "OPEN"))

                def open_input_file(self, path):
                    return pa.BufferReader(call(path, "OPEN"))

                def normalize_path(self, path):
                    return path

                def _ro(self, *a, **k):
                    raise NotImplementedError("webhdfs reader is read-only")

                create_dir = delete_dir = delete_dir_contents = _ro
                delete_root_dir_contents = delete_file = move = copy_file = _ro
                open_output_stream = open_append_stream = _ro

            return PyFileSystem(_H()), within

        # -- manifest plumbing (self-contained: no package imports) ----
        def _versions(self):
            import posixpath

            from pyarrow.fs import FileSelector

            mdir = posixpath.join(self.root, "_pqrs_manifest")
            try:
                infos = self.fs.get_file_info(
                    FileSelector(mdir, allow_not_found=True)
                )
            except (FileNotFoundError, OSError):
                return []
            out = []
            for info in infos:
                name = info.path.rsplit("/", 1)[-1]
                if name.startswith("v") and name.endswith(".json"):
                    try:
                        out.append(int(name[1:-5]))
                    except ValueError:
                        pass
            return sorted(out)

        def _read_json(self, fs, path):
            import json

            with fs.open_input_stream(path) as fh:
                return json.loads(fh.read().decode("utf-8"))

        def _manifest(self, version: int):
            import posixpath

            from pyarrow.fs import FileType

            p = posixpath.join(self.root, "_pqrs_manifest", f"v{version:020d}.json")
            if self.fs.get_file_info(p).type == FileType.NotFound:
                raise RuntimeError(
                    f"manifest v{version} of {self.root_uri} is gone (vacuumed?) — "
                    "a streaming offset needs its manifest retained; keep "
                    "manifests at least as long as stream checkpoints"
                )
            mf = self._read_json(self.fs, p)
            for c in mf.get("commits", []):
                # spilled file lists (manifest-of-manifests tier): resolve
                # the ref like manifest.load_manifest does — anchored at
                # the entry's base for shallow-cloned commits
                if "files_ref" in c and not c.get("files"):
                    bfs, base = self._resolve(c.get("base", self.root_uri))
                    payload = self._read_json(
                        bfs, posixpath.join(base, *c["files_ref"].split("/"))
                    )
                    c["files"] = (
                        payload if isinstance(payload, list) else payload.get("files", [])
                    )
            return mf

        # -- multi-table-txn gate --------------------------------------
        def _txn_state(self, marker: str) -> str:
            st = self._TXN_CACHE.get(marker)
            if st is not None:
                return st
            import json

            from pyarrow.fs import FileType

            fs, path = self._resolve(marker)
            if fs.get_file_info(path).type == FileType.NotFound:
                return "pending"
            with fs.open_input_stream(path) as fh:
                st = json.loads(fh.read().decode("utf-8")).get("state", "committed")
            self._TXN_CACHE[marker] = st
            return st

        def _txn_visible(self, c: dict) -> bool:
            t = c.get("txn")
            return t is None or self._txn_state(t) == "committed"

        def _txn_markers(self, version: int):
            hit = self._txn_marker_cache.get(version)
            if hit is None:
                hit = sorted(
                    {c["txn"] for c in self._manifest(version)["commits"] if "txn" in c}
                )
                self._txn_marker_cache[version] = hit
            return hit

        def _txn_frontier(self, hi: int, lo: int | None = None) -> int:
            """Highest offset the stream may advance to: one below the
            earliest version whose manifest still carries an UNDECIDED
            txn entry. The stream must not pass an undecided version —
            its content is not yet fixed (commit would add rows a
            replayed offset range must then reproduce deterministically);
            once every marker in a version is decided, the version's
            visible content is immutable and the frontier moves. Cost per
            poll: memoized marker lists + one exists() per still-pending
            marker."""
            for v in self._versions():
                if v > hi:
                    break
                if lo is not None and v <= lo:
                    continue
                if any(self._txn_state(m) == "pending" for m in self._txn_markers(v)):
                    return v - 1
            return hi

        def _file_set(self, version: int):
            if version <= 0:
                return set()
            hit = self._fset_cache.get(version)
            if hit is not None:
                return hit
            out = set()
            for c in self._manifest(version)["commits"]:
                if not self._txn_visible(c):
                    # aborted-txn entries never surface; pending ones
                    # cannot occur here (the frontier holds the stream
                    # below any undecided version)
                    continue
                ow = c.get("ow")
                if ow:
                    # deferred txn-overwrite (manifest.effective_commits's
                    # stream twin): a visible 'ow' entry erases earlier
                    # files in its scope from the running set — the CDF
                    # diff then emits them as deletes at this version
                    out = self._mask_overwrite(out, ow)
                if c.get("kind") == "dv":
                    # dv commits carry tombstone keys, not table rows:
                    # the APPEND feed skips them (it surfaces appended
                    # data only); the CDF walk streams them separately
                    # as key-only delete rows (_dv_entries)
                    continue
                # carry the base URI verbatim — each read re-resolves it,
                # so a shallow clone's donor may live on a different store
                base = c.get("base", self.root_uri)
                self._dir_sv[(base, c["dir"])] = c.get("schema_v", 1)
                for f in c["files"]:
                    out.add((base, c["dir"], f))
            self._fset_cache[version] = out
            return out

        @staticmethod
        def _mask_overwrite(out, ow):
            """Apply one deferred-overwrite spec to the running file set:
            scope='all' truncates, scope='groups' drops files whose hive
            partition tuple (under the spec the overwrite was written
            with) is in its touched list. Positional like the batch read
            path; the txn frontier guarantees the entry is decided by
            the time the stream processes its version."""
            if ow.get("scope") == "all":
                return set()
            # driver-side (called from _file_set at planning time), so
            # reuse the batch path's hive parser rather than forking it
            from parquetranger_spark.sources.manifest import partition_values_of

            spec = list(ow.get("spec") or [])
            touched = {tuple(t) for t in ow.get("touched", [])}
            return {
                (base, d, f)
                for base, d, f in out
                if partition_values_of(f, spec) not in touched
            }

        def _schema_log(self, refresh: bool = False):
            """The table's schema epochs, read through pyarrow.fs (driver
            side — plans and the simple reader; executors receive the
            resolved per-file column plan instead). Cached per reader;
            refreshed once on an unknown epoch stamp."""
            if self._slog_cache is None or refresh:
                import json as _json
                import posixpath

                from pyarrow import fs as pafs

                sdir = posixpath.join(self.root, "_pqrs_schema")
                out = []
                try:
                    infos = self.fs.get_file_info(
                        pafs.FileSelector(sdir, recursive=False)
                    )
                except (FileNotFoundError, OSError):
                    infos = []
                for fi in infos:
                    if fi.is_file and fi.path.endswith(".json"):
                        with self.fs.open_input_stream(fi.path) as f:
                            out.append(_json.loads(f.read().decode()))
                out.sort(key=lambda e: e["v"])
                self._slog_cache = out
            return self._slog_cache

        def _col_plan(self, base: str, cdir: str):
            """Column-source plan for one commit dir, or None when it
            already speaks the current epoch (the zero-DDL fast path):
            current column -> ('src', epoch-era physical name) for
            renames, ('default', value) for columns the epoch predates
            (the Iceberg initial default; also shields dead same-name
            columns left by drop-then-readd from leaking)."""
            slog = self._schema_log()
            if not slog:
                return None
            sv = self._dir_sv.get((base, cdir), 1)
            cur = slog[-1]
            if sv == cur["v"]:
                return None
            epochs = {e["v"]: e for e in slog}
            if sv not in epochs:
                slog = self._schema_log(refresh=True)
                epochs = {e["v"]: e for e in slog}
                cur = slog[-1]
                if sv not in epochs:
                    raise RuntimeError(
                        f"commit {cdir!r} stamped with unknown schema epoch {sv}"
                    )
                if sv == cur["v"]:
                    return None
            by_id = {f["id"]: f for f in epochs[sv]["fields"]}
            plan = {}
            for f in cur["fields"]:
                old = by_id.get(f["id"])
                if old is None:
                    plan[f["name"]] = ("default", f.get("default"))
                    continue
                nmap = self._nested_plan(old, f, slog)
                if nmap is not None:
                    plan[f["name"]] = ("nested", {"src": old["name"], "map": nmap})
                elif old["name"] != f["name"]:
                    plan[f["name"]] = ("src", old["name"])
            return plan or None

        @staticmethod
        def _nested_plan(old: dict, cur: dict, slog: list):
            """Per-member plan for a struct-content column whose shape
            differs between the commit's epoch and the current one
            (nested schema evolution), RECURSIVE at every depth:
            [(cur_member, src_member|None, default, sub_plan|None)] —
            built DRIVER-side from nested field ids so executors never
            read the schema dir (this runs in _col_plan, planning time —
            same driver-only contract as _new_files' package import).
            Resolution (incl. pre-id epoch synthesis) delegates to the
            batch read path's nested_fields_for, so stream and batch can
            never disagree on the same manifest. A level where either
            side carries no ids never changed shape (ids persist through
            every later epoch once assigned), so its sub-plan is None
            and the executor plain-casts. None when no nested mapping is
            needed (identical type json, or no nested ids anywhere —
            pre-feature tables)."""
            cur_nested = cur.get("fields")
            if not cur_nested:
                return None
            from parquetranger_spark.sources.schema_log import (
                descend_containers,
                nested_fields_for,
            )

            if descend_containers(old.get("type"))[0] is None:
                return None
            src_nested = nested_fields_for(old, slog)
            if src_nested is None:
                return None
            cur_resolved = nested_fields_for(cur, slog) or cur_nested
            # tree equality compares IDS too, never just type jsons: a
            # drop-then-readd reproduces an identical type json under a
            # new member id, and skipping the plan would resurrect the
            # dropped values
            if src_nested == cur_resolved and old.get("type") == cur.get("type"):
                return None

            def build(src_members, cur_members):
                by_id = {n["id"]: n for n in src_members}
                out = []
                for n in cur_members:
                    s = by_id.get(n["id"])
                    sub = None
                    if s is not None and s.get("fields") and n.get("fields") and s != n:
                        sub = build(s["fields"], n["fields"])
                    out.append(
                        (n["name"], s["name"] if s else None, n.get("default"), sub)
                    )
                return out

            return build(src_nested, cur_resolved)

        def _dv_entries(self, version: int):
            """[(commit_index, key_cols, [triples])] for the deletion-
            vector commits live at ``version`` — the CDF face of
            merge-on-read deletes (the append feed still skips them)."""
            if version <= 0:
                return []
            hit = self._dv_cache.get(version)
            if hit is not None:
                return hit
            out = []
            for ci, c in enumerate(self._manifest(version)["commits"]):
                # enumerate position is the commit index the dead-map
                # positions key on — skipping gated entries must not
                # renumber the rest, so the gate is a continue inside
                # the SAME enumeration
                if c.get("kind") != "dv" or not self._txn_visible(c):
                    continue
                base = c.get("base", self.root_uri)
                out.append(
                    (
                        ci,
                        tuple(c.get("key_cols") or ()),
                        [(base, c["dir"], f) for f in c["files"]],
                    )
                )
            self._dv_cache[version] = out
            return out

        def _cast_part(self, v: str, typ: str):
            # Spark %xx-escapes special characters in partition dir values
            # (e.g. ':' → %3A) — unescape so the stream agrees with what
            # the batch read path's hive discovery reconstructs
            from urllib.parse import unquote

            v = unquote(v)
            if v == "__HIVE_DEFAULT_PARTITION__":
                return None
            t = typ.strip().lower()
            if t in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
                return int(v)
            if t in ("float", "double"):
                return float(v)
            if t == "boolean":
                return v.lower() == "true"
            if t == "date":
                from datetime import date

                return date.fromisoformat(v)
            if t.startswith("timestamp"):
                from datetime import datetime

                return datetime.fromisoformat(v.replace(" ", "T"))
            return v

        def _new_files(self, lo: int, hi: int):
            """Sorted diff of live files between two versions, stats-pruned
            when a subscription predicate is set. Runs at PLANNING time on
            the driver (both reader flavors), so the package import is
            safe — executors never execute this."""
            new = sorted(self._file_set(hi) - self._file_set(lo))
            if not self.skip_preds or not new:
                return new
            from parquetranger_spark.sources.manifest import file_may_match

            owner = {}
            for c in self._manifest(hi)["commits"]:
                base = c.get("base", self.root_uri)
                for f in c["files"]:
                    owner[(base, c["dir"], f)] = (c, f)

            def commit_preds(c):
                # a commit's stats are keyed by the names current when it
                # was WRITTEN: translate the subscription's current names
                # back by field id (same rule as the batch skipping path);
                # conjuncts on columns the epoch lacks drop for that
                # commit only — pruning stays sound, just less sharp
                slog = self._schema_log()
                if not slog:
                    return self.skip_preds
                sv = c.get("schema_v", 1)
                cur = slog[-1]
                if sv == cur["v"]:
                    return self.skip_preds
                by_id = {
                    f["id"]: f["name"]
                    for e in slog
                    if e["v"] == sv
                    for f in e["fields"]
                }
                name_of = {
                    f["name"]: by_id.get(f["id"]) for f in cur["fields"]
                }
                out = []
                for p in self.skip_preds:
                    nm = name_of.get(p[0], p[0])
                    if nm is not None:
                        out.append((nm,) + tuple(p[1:]))
                return out

            return [
                k
                for k in new
                if k not in owner
                or file_may_match(owner[k][0], owner[k][1], commit_preds(owner[k][0]))
            ]

        def _file_rows(self, triples, extras, drop_row=None, use_plan=True):
            """Rows of the given (base, dir, rel) files in manifest
            order; ``extras`` fills pseudo-columns (CDF's _change_type /
            _commit_version) that exist in the output schema but not in
            the files; ``drop_row(row_tuple)`` filters (the bootstrap's
            deletion-vector mask). ``use_plan=False`` skips schema-epoch
            mapping — the dv KEY files, whose key columns are
            DDL-immutable and whose non-key columns are NULL by the
            delete-row contract."""
            import posixpath

            import pyarrow.parquet as pq

            rows = []
            for base, cdir, rel in triples:
                # hive col=value dirs inside the commit carry the
                # partition columns the file itself omits
                parts = {}
                for seg in rel.split("/")[:-1]:
                    if "=" in seg:
                        k, v = seg.split("=", 1)
                        parts[k] = v
                bfs, bpath = self._resolve(base)
                tbl = pq.read_table(
                    posixpath.join(bpath, cdir, rel), filesystem=bfs
                )
                n = tbl.num_rows
                plan = self._col_plan(base, cdir) if use_plan else None

                from pyspark.sql.types import (
                    ArrayType as _Arr,
                    MapType as _Map,
                    StructType as _Struct,
                )

                def _plain(v, dt=None):
                    # pyarrow's to_pylist emits MAP values as [(k, v)…]
                    # and an EMPTY non-null map as [] — Spark's row
                    # conversion requires dicts for MapType, so convert
                    # by the DECLARED type when we have it (tuple
                    # sniffing cannot tell an empty map from an empty
                    # array and crashed on empty maps)
                    if v is None:
                        return None
                    if isinstance(dt, _Map):
                        return {e[0]: _plain(e[1], dt.valueType) for e in v}
                    if isinstance(dt, _Arr):
                        return [_plain(e, dt.elementType) for e in v]
                    if isinstance(dt, _Struct):
                        return {
                            f.name: _plain(v.get(f.name), f.dataType)
                            for f in dt.fields
                        }
                    # no declared type (legacy option path): sniff
                    if isinstance(v, list):
                        if v and isinstance(v[0], tuple):
                            return {e[0]: _plain(e[1]) for e in v}
                        return [_plain(e) for e in v]
                    if isinstance(v, dict):
                        return {k2: _plain(v2) for k2, v2 in v.items()}
                    return v

                dts = (
                    [f.dataType for f in self.schema_st.fields]
                    if self.schema_st is not None
                    else [None] * len(self.cols)
                )
                colvals = []
                for name, typ, dt in zip(self.cols, self.types, dts):
                    if name in extras:
                        colvals.append([extras[name]] * n)
                        continue
                    phys = name
                    if plan is not None and name in plan:
                        kind, val = plan[name]
                        if kind == "default":
                            colvals.append([val] * n)
                            continue
                        if kind == "nested":
                            src = val["src"]
                            if src in tbl.column_names:
                                raw = tbl.column(src).to_pylist()

                                def remap(d, plan, dt=None):
                                    # recursive over pylist shapes
                                    # guided by the DECLARED type when
                                    # known: map containers (even empty)
                                    # dict-ify, arrays stay lists, and
                                    # the plan applies at struct nodes;
                                    # without a type, sniff (k,v) tuples
                                    if d is None:
                                        return None
                                    if isinstance(dt, _Map):
                                        return {
                                            e[0]: remap(e[1], plan, dt.valueType)
                                            for e in d
                                        }
                                    if isinstance(dt, _Arr):
                                        return [
                                            remap(e, plan, dt.elementType)
                                            for e in d
                                        ]
                                    if isinstance(d, list):
                                        if d and isinstance(d[0], tuple):
                                            return {e[0]: remap(e[1], plan) for e in d}
                                        return [remap(e, plan) for e in d]
                                    fdt = (
                                        {f.name: f.dataType for f in dt.fields}
                                        if isinstance(dt, _Struct)
                                        else {}
                                    )
                                    return {
                                        cn: (
                                            remap(d.get(sn), sub, fdt.get(cn))
                                            if sn is not None and sub
                                            else _plain(d.get(sn), fdt.get(cn))
                                            if sn is not None
                                            else dv
                                        )
                                        for (cn, sn, dv, sub) in plan
                                    }

                                colvals.append(
                                    [remap(d, val["map"], dt) for d in raw]
                                )
                            else:
                                colvals.append([None] * n)
                            continue
                        phys = val
                    if phys in tbl.column_names:
                        colvals.append(
                            [_plain(v, dt) for v in tbl.column(phys).to_pylist()]
                        )
                    elif name in parts:
                        colvals.append([self._cast_part(parts[name], typ)] * n)
                    else:
                        colvals.append([None] * n)
                emitted = zip(*colvals)
                if drop_row is not None:
                    emitted = (r for r in emitted if not drop_row(r))
                rows.extend(emitted)
            return rows

        def _rows_between(self, lo: int, hi: int):
            if self.meta_only:
                return self._meta_rows_between(lo, hi)
            if self.cdf:
                return self._cdf_rows_between(lo, hi)
            return self._file_rows(self._new_files(lo, hi), {})

        def _meta_rows_between(self, lo: int, hi: int):
            """_n_commits/_n_files are the table's SNAPSHOT totals at the
            version (the state an operator watches trend); _files_added
            is the version's own contribution — the diff of raw file
            sets INCLUDING dv key files (which _file_set deliberately
            excludes from the data feed), so a delete-only version still
            reports what it shipped."""

            def allf(v):
                if v <= 0:
                    return set()
                return {
                    (c.get("base", self.root_uri), c["dir"], f)
                    for c in self._manifest(v)["commits"]
                    if self._txn_visible(c)
                    for f in c.get("files") or ()
                }

            rows = []
            try:
                prev = allf(lo)
            except RuntimeError:
                prev = None  # predecessor vacuumed: first delta unknowable
            for v in range(lo + 1, hi + 1):
                m = self._manifest(v)
                cs = [c for c in m["commits"] if self._txn_visible(c)]
                cur = allf(v)
                rows.append(
                    (
                        v,
                        float(m.get("ts") or 0.0),
                        str(m.get("op") or ""),
                        len(cs),
                        sum(len(c.get("files") or ()) for c in cs),
                        len(cur - prev) if prev is not None else None,
                    )
                )
                prev = cur
            return rows

        def _cdf_rows_between(self, lo: int, hi: int):
            """Change-data-feed batch: walk each version step in (lo, hi]
            and emit its file diff as rows — removed files as deletes
            FIRST, then added files as inserts (the replay order that
            keeps a downstream sync convergent), each stamped with the
            commit version that caused it. File-granular, like
            changes_between: a rewritten file emits delete+insert pairs
            for its ride-along rows too. DELETION-VECTOR commits stream
            as key-only delete rows (key columns filled, the rest NULL)
            — a dv tombstones every matching key below it, so a replica
            applying the keys converges; the bootstrap snapshot instead
            ships dv-EFFECTIVE rows (position-aware mask: a row is dead
            iff some dv above its file's commit matches its key), since
            file rows and their tombstones would otherwise race inside
            one emitted version. Driver-side O(versions x files)
            manifest walking — the control-plane cost the simple reader
            already accepts."""
            rows = []
            bootstrap_v = None
            try:
                prev = self._file_set(lo)
                prev_dv = self._dv_entries(lo)
            except RuntimeError:
                if lo == self.cdf_start - 1 and lo > 0:
                    # snapshot bootstrap: starting_version='earliest' on a
                    # vacuumed table — the predecessor manifest no longer
                    # exists, so the start version replays WHOLE (dv-
                    # effective) as inserts; later steps are true deltas
                    prev = set()
                    prev_dv = []
                    bootstrap_v = lo + 1
                else:
                    raise
            for v in range(lo + 1, hi + 1):
                cur = self._file_set(v)
                cur_dv = self._dv_entries(v)
                removed = sorted(prev - cur)
                added = sorted(cur - prev)
                if v == bootstrap_v:
                    rows.extend(self._bootstrap_rows(v, added, cur_dv))
                else:
                    rows.extend(
                        self._file_rows(
                            removed, {"_change_type": "delete", "_commit_version": v}
                        )
                    )
                    # dv commits added in this step: their key files ARE
                    # delete rows (key cols present, others NULL)
                    seen = {(ci, kc) for ci, kc, _ in prev_dv}
                    for ci, kc, triples in cur_dv:
                        if (ci, kc) in seen:
                            continue
                        rows.extend(
                            self._file_rows(
                                triples,
                                {"_change_type": "delete", "_commit_version": v},
                                use_plan=False,
                            )
                        )
                    rows.extend(
                        self._file_rows(
                            added, {"_change_type": "insert", "_commit_version": v}
                        )
                    )
                prev, prev_dv = cur, cur_dv
            return rows

        def _dv_dead_map(self, dv_entries):
            """key-tuple -> max dv commit index, read from the tombstone
            key files (tombstone-sized)."""
            import posixpath

            import pyarrow.parquet as pq

            dead = {}
            key_cols = None
            for ci, kc, triples in dv_entries:
                key_cols = kc
                for base, cdir, rel in triples:
                    bfs, bpath = self._resolve(base)
                    tbl = pq.read_table(
                        posixpath.join(bpath, cdir, rel), filesystem=bfs
                    )
                    cols = [tbl.column(k).to_pylist() for k in kc]
                    for key in zip(*cols):
                        if dead.get(key, -1) < ci:
                            dead[key] = ci
            return key_cols, dead

        def _bootstrap_rows(self, v, added, dv_entries):
            """The start version's full snapshot as inserts, with
            deletion-vector-dead rows masked out position-aware (dead iff
            a dv ABOVE the row's commit matches its key)."""
            if not dv_entries:
                return self._file_rows(
                    added, {"_change_type": "insert", "_commit_version": v}
                )
            key_cols, dead = self._dv_dead_map(dv_entries)
            kpos = [self.cols.index(k) for k in key_cols]
            # commit index per triple, from the manifest walk
            ci_of = {}
            for ci, c in enumerate(self._manifest(v)["commits"]):
                if c.get("kind") == "dv":
                    continue
                base = c.get("base", self.root_uri)
                for f in c["files"]:
                    ci_of[(base, c["dir"], f)] = ci
            out = []
            for triple in added:
                ci = ci_of.get(triple, -1)

                def dead_row(row, _ci=ci):
                    return dead.get(tuple(row[i] for i in kpos), -1) > _ci

                out.extend(
                    self._file_rows(
                        [triple],
                        {"_change_type": "insert", "_commit_version": v},
                        drop_row=dead_row,
                    )
                )
            return out

        # -- streaming contract ----------------------------------------
        def initialOffset(self):
            return {"v": self.cdf_start - 1 if self.cdf else 0}

        def read(self, start):
            lo = int(start["v"])
            # pin the retention hold at PLANNING time: a crash-now
            # restart re-plans from this very offset, and commit()
            # callbacks lag a whole run under availableNow — waiting for
            # them leaves the first run's horizon unpinned
            self._advance_hold(lo)
            vs = self._versions()
            hi = self._txn_frontier(vs[-1] if vs else 0, lo=lo)
            if hi <= lo:
                # ITERATOR, not list: on a no-progress poll the harness
                # probes next(it) to verify emptiness (a list TypeErrors)
                return iter(()), {"v": lo}
            return self._rows_between(lo, hi), {"v": hi}

        def readBetweenOffsets(self, start, end):
            # ITERATOR, not list: this replay path runs through the
            # worker-side data_source_read_func (a fresh reader resuming
            # an existing checkpoint has no prefetch cache), which
            # rejects bare lists
            return iter(self._rows_between(int(start["v"]), int(end["v"])))

    class _FilePartition(InputPartition):
        def __init__(self, base: str, cdir: str, rel: str, extras=None):
            self.base, self.cdir, self.rel = base, cdir, rel
            # CDF pseudo-column values (_change_type/_commit_version)
            # planned driver-side, applied task-side
            self.extras = extras or {}

    class _PartitionedReader(DataSourceStreamReader):
        """Executor-side flavor: one InputPartition per file added between
        two manifest versions; each Spark task reads its file with
        pyarrow and streams Arrow RecordBatches across the boundary —
        the scale path for fat commits (the simple reader above
        materializes whole batches driver-side). Offset planning (tiny
        manifest JSON diffs) stays on the driver; row bytes never touch
        it."""

        def __init__(self, options):
            # reuse the simple reader's manifest plumbing driver-side
            self._mf = _Reader(options)
            self.cols = self._mf.cols
            self.types = self._mf.types
            # JSON, not DDL: parsing DDL needs a live JVM session, which
            # executor python workers don't have — StructType.fromJson is
            # pure Python
            self.schema_json = options["schema_json"]

        def initialOffset(self):
            return {"v": self._mf.cdf_start - 1 if self._mf.cdf else 0}

        def latestOffset(self):
            vs = self._mf._versions()
            return {"v": self._mf._txn_frontier(vs[-1] if vs else 0)}

        def commit(self, end):
            # same retention-hold advance as the simple flavor
            self._mf.commit(end)

        def partitions(self, start, end):
            lo, hi = int(start["v"]), int(end["v"])
            # planning-time retention pin, same rationale as _Reader.read
            self._mf._advance_hold(lo)
            if self._mf.cdf:
                # one task per changed file, change-kind planned here:
                # deletes of a version before its inserts (list order is
                # the task order only loosely — consumers needing strict
                # replay order sort on _commit_version, _change_type).
                # Deletion-vector commits plan as delete partitions of
                # their key files; a dv-bearing bootstrap passes the
                # (tiny) dead-key map to each snapshot task (see _Reader)
                out = []
                bootstrap_v = None
                try:
                    prev = self._mf._file_set(lo)
                    prev_dv = self._mf._dv_entries(lo)
                except RuntimeError:
                    if lo == self._mf.cdf_start - 1 and lo > 0:
                        prev, prev_dv = set(), []
                        bootstrap_v = lo + 1
                    else:
                        raise
                for v in range(lo + 1, hi + 1):
                    cur = self._mf._file_set(v)
                    cur_dv = self._mf._dv_entries(v)
                    if v == bootstrap_v and cur_dv:
                        key_cols, dead = self._mf._dv_dead_map(cur_dv)
                        kpos = [self._mf.cols.index(k) for k in key_cols]
                        ci_of = {}
                        for ci, c in enumerate(self._mf._manifest(v)["commits"]):
                            if c.get("kind") == "dv":
                                continue
                            base = c.get("base", self._mf.root_uri)
                            for f in c["files"]:
                                ci_of[(base, c["dir"], f)] = ci
                        dead_list = [list(k) + [mx] for k, mx in dead.items()]
                        for b, d, r in sorted(cur - prev):
                            out.append(_FilePartition(
                                b, d, r,
                                {
                                    "_change_type": "insert",
                                    "_commit_version": v,
                                    "__dv_mask": {
                                        "kpos": kpos,
                                        "dead": dead_list,
                                        "ci": ci_of.get((b, d, r), -1),
                                    },
                                },
                            ))
                        prev, prev_dv = cur, cur_dv
                        continue
                    for b, d, r in sorted(prev - cur):
                        out.append(_FilePartition(
                            b, d, r,
                            {"_change_type": "delete", "_commit_version": v},
                        ))
                    seen = {(ci, kc) for ci, kc, _ in prev_dv}
                    for ci, kc, triples in cur_dv:
                        if (ci, kc) in seen:
                            continue
                        for b, d, r in triples:
                            out.append(_FilePartition(
                                b, d, r,
                                {
                                    "_change_type": "delete",
                                    "_commit_version": v,
                                    # dv KEY file: key cols are
                                    # DDL-immutable and the rest are NULL
                                    # by contract — no epoch plan
                                    "__dv_keyfile": True,
                                },
                            ))
                    for b, d, r in sorted(cur - prev):
                        out.append(_FilePartition(
                            b, d, r,
                            {"_change_type": "insert", "_commit_version": v},
                        ))
                    prev, prev_dv = cur, cur_dv
                return self._with_plans(out)
            new = self._mf._new_files(lo, hi)
            return self._with_plans([_FilePartition(b, d, r) for b, d, r in new])

        def _with_plans(self, parts_list):
            """Attach each data partition's schema-epoch column plan
            DRIVER-side (executors never list the schema dir): renames
            map to the epoch-era physical name, predating columns to
            their initial default — the same field-id rule as the batch
            read path and the simple reader."""
            for p_ in parts_list:
                if p_.extras.pop("__dv_keyfile", False):
                    continue
                plan = self._mf._col_plan(p_.base, p_.cdir)
                if plan is not None:
                    p_.extras["__col_plan"] = plan
            return parts_list

        def read(self, partition):
            import json
            import posixpath

            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_type
            from pyspark.sql.types import StructType

            st = StructType.fromJson(json.loads(self.schema_json))
            parts = {}
            for seg in partition.rel.split("/")[:-1]:
                if "=" in seg:
                    k, v = seg.split("=", 1)
                    parts[k] = v
            # executor-side: pyarrow.fs resolution again — no JVM, no
            # package import, any URI scheme pyarrow reaches
            bfs, bpath = _Reader._resolve(partition.base)
            tbl = pq.read_table(
                posixpath.join(bpath, partition.cdir, partition.rel),
                filesystem=bfs,
            )
            n = tbl.num_rows
            extras = dict(getattr(partition, "extras", {}) or {})
            mask_spec = extras.pop("__dv_mask", None)
            if mask_spec is not None and mask_spec["dead"]:
                # bootstrap dv mask: drop rows whose key maps to a dv
                # above this file's commit (position-aware, same rule as
                # the batch read path)
                kpos = mask_spec["kpos"]
                ci = mask_spec["ci"]
                dead = {tuple(e[:-1]): e[-1] for e in mask_spec["dead"]}
                names = [self.cols[i] for i in kpos]
                keycols = [tbl.column(nm).to_pylist() for nm in names]
                keep = [
                    dead.get(key, -1) <= ci for key in zip(*keycols)
                ]
                tbl = tbl.filter(pa.array(keep, type=pa.bool_()))
                n = tbl.num_rows
            col_plan = extras.pop("__col_plan", None) or {}
            arrays, fields = [], []
            for field, typ in zip(st.fields, self.types):
                name = field.name
                patype = to_arrow_type(field.dataType)
                phys, dflt, nmap = name, None, None
                if name in col_plan:
                    kind, val = col_plan[name]
                    if kind == "default":
                        phys, dflt = None, val
                    elif kind == "nested":
                        phys, nmap = val["src"], val["map"]
                    else:
                        phys = val
                if nmap is not None and phys in tbl.column_names:
                    # nested schema evolution: rebuild the struct member
                    # by member from the epoch-era physical column —
                    # rename → take child, widen → cast child, added →
                    # default/null — keeping NULL structs NULL via mask
                    # and recursing through arrays (per-element on the
                    # flattened values child, offsets reused), maps
                    # (items child) and deeper structs
                    import pyarrow.compute as pc

                    def rebuild(src, ttype, plan):
                        if pa.types.is_list(ttype) or pa.types.is_large_list(ttype):
                            vals = rebuild(src.values, ttype.value_type, plan)
                            cls_ = (
                                pa.LargeListArray
                                if pa.types.is_large_list(ttype)
                                else pa.ListArray
                            )
                            return cls_.from_arrays(
                                src.offsets, vals, mask=pc.is_null(src)
                            )
                        if pa.types.is_map(ttype):
                            items = rebuild(src.items, ttype.item_type, plan)
                            # MapArray.from_arrays has no mask= — NULL
                            # entries must ride in as NULL offsets, else
                            # every null map resurrects as {}
                            import numpy as _np

                            nulls = pc.is_null(src).to_numpy(
                                zero_copy_only=False
                            )
                            off = src.offsets.to_numpy()
                            off = pa.array(
                                off,
                                mask=_np.concatenate([nulls, [False]]),
                            )
                            return pa.MapArray.from_arrays(
                                off, src.keys, items
                            )
                        if not pa.types.is_struct(ttype):
                            return src.cast(ttype)
                        m = len(src)
                        src_names = [fl.name for fl in src.type]
                        children, child_names = [], []
                        for cn, sn, dv, sub in plan:
                            ct = ttype.field(cn).type
                            if sn is not None and sn in src_names:
                                ch = src.field(sn)
                                children.append(
                                    rebuild(ch, ct, sub) if sub else ch.cast(ct)
                                )
                            elif dv is not None:
                                children.append(pa.array([dv] * m).cast(ct))
                            else:
                                children.append(pa.nulls(m, type=ct))
                            child_names.append(cn)
                        return pa.StructArray.from_arrays(
                            children, names=child_names, mask=pc.is_null(src)
                        )

                    sa = tbl.column(phys).combine_chunks()
                    arrays.append(rebuild(sa, patype, nmap))
                    fields.append(pa.field(name, patype))
                    continue
                if name in extras:
                    arrays.append(pa.array([extras[name]] * n).cast(patype))
                elif phys is None:
                    arrays.append(
                        pa.array([dflt] * n).cast(patype)
                        if dflt is not None
                        else pa.nulls(n, type=patype)
                    )
                elif phys in tbl.column_names:
                    arrays.append(tbl.column(phys).combine_chunks().cast(patype))
                elif name in parts:
                    val = _Reader._cast_part(self._mf, parts[name], typ)
                    arrays.append(pa.array([val] * n).cast(patype))
                else:
                    arrays.append(pa.nulls(n, type=patype))
                fields.append(pa.field(name, patype))
            out = pa.table(arrays, schema=pa.schema(fields))
            yield from out.to_batches(max_chunksize=65536)

    class ManifestStream(DataSource):
        @classmethod
        def name(cls):
            return "pqrs_manifest_stream"

        def schema(self):
            return self.options["schema_ddl"]

        def simpleStreamReader(self, schema):
            return _Reader(self.options)

    class ManifestStreamPartitioned(DataSource):
        @classmethod
        def name(cls):
            return "pqrs_manifest_stream_px"

        def schema(self):
            return self.options["schema_ddl"]

        def streamReader(self, schema):
            return _PartitionedReader(self.options)

    return ManifestStream, ManifestStreamPartitioned


manifest_stream_sources = manifest_stream_source  # both classes, one factory


def register_manifest_stream(spark) -> None:
    """Idempotently register both flavors for this session."""
    simple, partitioned = manifest_stream_source()
    spark.dataSource.register(simple)
    spark.dataSource.register(partitioned)
