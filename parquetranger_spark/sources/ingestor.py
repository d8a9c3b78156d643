"""Nested-object shredding into a forest of tables.

Reference: /root/reference/parquetranger/ingestor.py — ``ObjIngestor``
recursively splits JSON-ish objects (ingest, ingestor.py:49-82):

- lists recurse per element under a ``list`` path component;
- bare atoms become ``{element: v}`` rows under ``element``;
- empty dicts are no-ops;
- dict atoms are routed to the table addressed by
  ``(*path, schema-<md5(json(type_map))[:9]>)`` (ingestor.py:100-109);
- nested composites recurse under ``key-<md5(key)[:9]>`` with
  ``__parent_id`` set to the parent's ``root_id_key`` value
  (ingestor.py:23,62-63), optionally a forced uuid4 (ingestor.py:71-75);
- key-code → original-key mapping is merged into ``key-map.json``
  (ingestor.py:87-98).

Two implementations:

- :class:`ObjIngestor` — driver-side object-at-a-time parity surface
  (context manager + buffered writers), for programmatic ingestion.
- :func:`shred_json_df` — the scale path: one distributed ``mapInPandas``
  pass runs the same recursion per record and emits ``(table, atoms_json)``
  rows; each discovered table is then materialized with a distributed
  ``spark.read.json`` + TableRepo write. Number of tables = number of
  distinct (path, schema) signatures — bounded and small — so the
  driver-side loop is over *tables*, never rows.
"""

from __future__ import annotations

import json
from hashlib import md5
from typing import Any
from uuid import uuid4

from pyspark.sql import DataFrame

from ..plans.schema import meta_path
from .fs import fs_for, join_path
from .table_repo import TableRepo
from .writers import RecordWriter

ATOM_TYPES = (int, float, str, bool, type(None))
SCHEMA_PREFIX = "schema"
KEY_PREFIX = "key"
LISTDIR = "list"
ATOM_KEY = "element"
PARENT_ID_KEY = "__parent_id"


def _pickle_self_by_value() -> None:
    """Executors may not have this package on their import path (the repo
    is not pip-installed); ship closure dependencies by value instead of
    by module reference."""
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


def _m5(s: str, prefix: str) -> str:
    return f"{prefix}-{md5(s.encode()).hexdigest()[:9]}"


def schema_code(type_map: dict[str, str]) -> str:
    return _m5(json.dumps(type_map, sort_keys=True), SCHEMA_PREFIX)


def key_code(key: str) -> str:
    return _m5(key, KEY_PREFIX)


def shred_record(
    obj: Any,
    root_id_key: str | None = None,
    force_key: bool = False,
    parents: tuple = (),
    parent_id=None,
):
    """Pure generator form of the reference recursion: yields
    ``(table_path_tuple, atoms_dict, keydic_updates)`` triples. Shared by
    the driver-side ingestor and the distributed shredder so semantics
    can't drift."""
    if isinstance(obj, list):
        for e in obj:
            yield from shred_record(e, root_id_key, force_key, (*parents, LISTDIR), parent_id)
        return
    if isinstance(obj, ATOM_TYPES):
        yield from shred_record(
            {ATOM_KEY: obj}, root_id_key, force_key, (*parents, ATOM_KEY), parent_id
        )
        return
    if not obj:
        return
    atoms, comp_elems, type_map = {}, {}, {}
    if parent_id is not None:
        obj = {**obj, PARENT_ID_KEY: parent_id}
    for k, v in obj.items():
        if isinstance(v, ATOM_TYPES):
            type_map[k] = type(v).__name__
            atoms[k] = v
        else:
            comp_elems[k] = v
    record_id = atoms.get(root_id_key) if root_id_key else None
    if record_id is None and force_key:
        record_id = uuid4().hex
        atoms[root_id_key] = record_id
        type_map[root_id_key] = "str"
    yield (*parents, schema_code(type_map)), atoms, {}
    for k, v in comp_elems.items():
        kc = key_code(k)
        yield (), {}, {kc: k}  # keydic update marker
        yield from shred_record(v, root_id_key, force_key, (*parents, kc), record_id)


class ObjIngestor:
    """Driver-side object-at-a-time ingestion (reference parity surface)."""

    def __init__(
        self,
        root: str,
        size_limit: int = 1_000_000,
        root_id_key: str | None = None,
        force_key: bool = False,
        spark=None,
    ):
        self.root = str(root)
        self.size_limit = size_limit
        self.root_id_key = root_id_key
        self.force_key = force_key
        self.writers: dict[tuple, RecordWriter] = {}
        self.keydic: dict[str, str] = {}
        self.total_atoms = 0
        self._spark = spark

    def ingest(self, obj: Any) -> None:
        for tbl, atoms, keyupd in shred_record(obj, self.root_id_key, self.force_key):
            if keyupd:
                self.keydic.update(keyupd)
            if atoms:
                self._get_writer(tbl, len(atoms)).add_record(atoms)
                self.total_atoms += len(atoms)

    def _get_writer(self, key: tuple, n_cols: int) -> RecordWriter:
        w = self.writers.get(key)
        if w is None:
            trepo = TableRepo(
                join_path(self.root, *key),
                max_records=self.size_limit // max(n_cols, 1),
                spark=self._spark,
            )
            w = RecordWriter(trepo, record_limit=self.size_limit)
            self.writers[key] = w
        return w

    def dump_largest(self) -> None:
        """No-op, as in the reference (ingestor.py:84-85 is ``pass``)."""

    def dump_all(self) -> None:
        for w in self.writers.values():
            w.flush()
        self._merge_key_map()

    def _merge_key_map(self) -> None:
        fs = fs_for(self.root, spark=self._spark)
        p = join_path(self.root, "key-map.json")
        if fs.exists(p):
            self.keydic.update(json.loads(fs.read_text(p)))
        if fs.exists(self.root):
            fs.write_text_atomic(p, json.dumps(self.keydic))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.dump_all()
        return False


def shred_json_df(
    df: DataFrame,
    json_col: str,
    root: str,
    root_id_key: str | None = None,
    fanout: int | None = None,
) -> dict[str, int]:
    """Distributed JSON shredding — the 100 TB path.

    Pass 1 (distributed): ``mapInPandas`` runs :func:`shred_record` per
    record and emits ``(tbl, atoms_json)``; the result is cached since both
    the table-key discovery and each per-table materialization consume it.
    Pass 2: for each discovered (path, schema) table — a bounded, small
    set — materialize rows via distributed ``spark.read.json`` and write a
    TableRepo under ``root``. Returns {relative table path: row count}.

    force_key/uuid generation is intentionally unsupported here: uuid4 per
    row is non-deterministic, which breaks retry semantics of distributed
    tasks; derive explicit ids up front instead.
    """
    import pandas as pd

    _pickle_self_by_value()
    spark = df.sparkSession

    def shred_batches(it):
        for pdf in it:
            tbls, payloads, keycodes, keynames = [], [], [], []
            for raw in pdf[json_col]:
                obj = json.loads(raw) if isinstance(raw, str) else raw
                for tbl, atoms, keyupd in shred_record(obj, root_id_key):
                    for kc, kn in keyupd.items():
                        keycodes.append(kc)
                        keynames.append(kn)
                    if atoms:
                        tbls.append("/".join(tbl))
                        payloads.append(json.dumps(atoms))
            yield pd.DataFrame(
                {
                    "tbl": tbls + [""] * len(keycodes),
                    "atoms_json": payloads + [""] * len(keycodes),
                    "key_code": [""] * len(tbls) + keycodes,
                    "key_name": [""] * len(tbls) + keynames,
                }
            )

    payload = df.select(json_col)
    # the shred is Python work (Arrow-batched, but CPU-bound per row): its
    # parallelism is the INPUT partition count, and a small source (one
    # parquet split — the common local case) would pin the whole pass to
    # one core. Fan out to the cluster's parallelism first; at scale the
    # source already has >= that many splits and no shuffle is added.
    target = fanout if fanout is not None else spark.sparkContext.defaultParallelism
    if target and payload.rdd.getNumPartitions() < target:
        payload = payload.repartition(target)
    shredded = payload.mapInPandas(
        shred_batches, "tbl string, atoms_json string, key_code string, key_name string"
    )
    shredded = shredded.cache()
    try:
        from pyspark.sql import functions as F

        # ONE aggregation pass over the (cached) shred surfaces everything
        # driver-side work needs: the key dictionary (key rows carry
        # tbl='') AND one sample row + row count per table (payload rows
        # carry key_code=''). Rows of a table share a single type-map by
        # construction (the schema hash IS the table address), so the one
        # sampled row is enough for from_json to stay JVM-side — no RDD
        # round-trip, no per-table inference scan, and no second
        # cache-materializing action (the previous two-collect shape paid
        # the shred scan twice).
        keydic, samples, counts = {}, {}, {}
        for r in (
            shredded.groupBy("tbl", "key_code", "key_name")
            .agg(F.first("atoms_json").alias("s"), F.count("*").alias("n"))
            .collect()
        ):
            if r["key_code"]:
                keydic[r["key_code"]] = r["key_name"]
            if r["tbl"]:
                samples[r["tbl"]] = r["s"]
                counts[r["tbl"]] = r["n"]

        def materialize(tbl: str) -> None:
            import uuid

            rows = shredded.where(shredded.tbl == tbl).select("atoms_json")
            # range(1) defaults to leafNodeDefaultParallelism slices — a
            # 32-task job evaluating one constant-foldable expression;
            # pin the probe to one partition (one task, same result)
            ddl = (
                spark.range(0, 1, 1, 1)
                .select(F.schema_of_json(F.lit(samples[tbl])))
                .first()[0]
            )
            # one sampled row fixes the field SET (rows of a table share a
            # type map by construction — the schema hash IS the table
            # address) but not value RANGES: e.g. an int above int64 in an
            # 'int'-typed table would silently from_json to null. Parse
            # ONCE with the corrupt-record channel attached and count
            # failures via observe() inside the write job itself — the
            # clean (overwhelmingly common) path pays a single parse pass.
            # Only an actually-corrupt table re-parses: full-scan inference
            # (spark.read.json widens exactly) + replace_all of the
            # misparsed rows.
            probe_ddl = ddl[:-1] + ",__pqr_corrupt: STRING>"
            parsed = rows.select(
                F.from_json(
                    "atoms_json", probe_ddl, {"columnNameOfCorruptRecord": "__pqr_corrupt"}
                ).alias("r")
            ).select("r.*")
            obs_name = f"pqrs_shred_{uuid.uuid4().hex[:8]}"
            from pyspark.sql import Observation

            obs = Observation(obs_name)
            mat = parsed.observe(
                obs, F.count(F.when(F.col("__pqr_corrupt").isNotNull(), 1)).alias("bad")
            ).drop("__pqr_corrupt")
            trepo = TableRepo(join_path(root, tbl), spark=spark)
            before = set(trepo.paths)
            trepo.extend(mat)
            if obs.get["bad"] > 0:
                # misparse detected: roll back exactly the files THIS call
                # appended (immutable unique file names make the diff
                # exact — pre-existing data from earlier ingests is never
                # touched)
                fs = fs_for(trepo.main_path, spark=spark)
                for p in set(trepo.paths) - before:
                    fs.delete(p)
                if before:
                    # the table predates this call and its frozen sidecar
                    # schema cannot hold this batch's value range —
                    # re-extending would silently null the offending
                    # values through align_to_schema. Fail loudly; the
                    # caller owns the schema-migration decision.
                    raise ValueError(
                        f"shred_json_df: batch for table {tbl!r} contains values "
                        "outside the existing table's frozen schema range; "
                        "rolled back this batch — migrate the table schema "
                        "(e.g. rewrite with a wider type) and re-ingest"
                    )
                # fresh table: drop the narrow sidecar we just created and
                # rewrite this batch under full-scan inference
                fs.delete(meta_path(trepo.main_path))
                wide = spark.read.json(rows.rdd.map(lambda r: r[0]))
                trepo.extend(wide)

        # distinct table roots → independent write jobs; submit them
        # concurrently so the Spark scheduler overlaps their stages (the
        # driver loop is over tables — bounded and small — never rows)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(samples)) or 1) as ex:
            list(ex.map(materialize, sorted(samples)))
        fs = fs_for(root, spark=spark)
        fs.mkdirs(root)
        # merge with any existing map (same semantics as
        # ObjIngestor._merge_key_map): successive shreds into one root must
        # accumulate key codes, not clobber earlier batches' mappings
        km = join_path(root, "key-map.json")
        if fs.exists(km):
            merged = json.loads(fs.read_text(km))
            merged.update(keydic)
            keydic = merged
        fs.write_text_atomic(km, json.dumps(keydic))
        return counts
    finally:
        shredded.unpersist()
