"""Iceberg-style schema log: metadata-only column DDL for manifest tables.

The reference's only schema-evolution story is ``allow_metadata_extension``
(core.py:405-421): widening the canonical schema REWRITES every existing
file — O(table) I/O hidden inside an append, a non-starter at 100 TB. This
module gives manifest tables the lakehouse answer (Iceberg schema-id
evolution / Delta column mapping): every canonical field carries a stable
**field id**, the full schema at each point in time is an immutable,
CAS-published **epoch** under ``<root>/_pqrs_schema/v%06d.json``, and data
commits stamp the epoch they were written under (``schema_v`` in the
manifest entry). ADD / RENAME / DROP / type-widen then touch only metadata:

- **add_column**: new field id; files from older epochs surface typed nulls
  (the standard parquet missing-column read).
- **rename_column**: same id, new name; older files are *read with their
  epoch's name* and aliased to the current one — no rewrite, and no
  false-null resurrection of the old column.
- **drop_column**: the field leaves the current epoch; older files simply
  stop projecting it. Ids are never reused, so a later re-add of the same
  name is a DIFFERENT column and old data correctly reads as null.
- **alter_column_type**: safe widenings only (int→long, float→double,
  decimal precision growth — the Iceberg-compatible set); older files cast
  on read.

Epochs are published with ``create_exclusive`` (the same CAS primitive the
manifest uses), so concurrent DDL serializes: the loser reloads and
re-validates against the winner's schema. Data writers never contend — a
commit is stamped with whatever epoch its aligned column set matches, so a
write racing a rename lands with the epoch it actually used and the reader
maps it by id regardless.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

from .fs import join_path

SCHEMA_DIR = "_pqrs_schema"

# widenings that are exact on every representable value (Iceberg's
# allowed type promotions) — anything else must go through an explicit
# add-new-column + backfill, never a silent lossy cast
_SAFE_WIDENINGS = {
    ("integer", "long"),
    ("short", "integer"),
    ("short", "long"),
    ("byte", "short"),
    ("byte", "integer"),
    ("byte", "long"),
    ("float", "double"),
}

# immutable once published → cache by file path, process-wide
_EPOCH_CACHE: dict[str, dict] = {}


def _epoch_path(root: str, v: int) -> str:
    return join_path(root, SCHEMA_DIR, f"v{v:06d}.json")


def invalidate_cache(root: str) -> None:
    """Forget cached epochs anywhere under ``root`` — purge() is the one
    in-protocol way an epoch path can be REUSED with different content
    (epoch files are never rewritten and vacuum never touches the schema
    dir), and a recreated table must not read its predecessor's log.
    The whole-root prefix also catches BRANCH logs
    (``<root>/_pqrs_branches/<name>/_pqrs_schema``), which a purge
    deletes along with everything else."""
    prefix = root.rstrip("/") + "/"
    for p in [p for p in _EPOCH_CACHE if p.startswith(prefix)]:
        _EPOCH_CACHE.pop(p, None)


def load_schema_log(fs, root: str) -> list[dict[str, Any]]:
    """Every published epoch, ordered by version — ``[]`` when the table
    has never seen DDL (the zero-cost common case: one exists() probe).
    Epoch payloads are immutable, so they are cached process-wide; only
    the (tiny) directory listing re-runs per call."""
    sdir = join_path(root, SCHEMA_DIR)
    if not fs.exists(sdir):
        return []
    from .fs import basename

    out = []
    for p in fs.list_names(sdir, ".json"):  # full paths, not basenames
        if not basename(p).startswith("v"):
            continue
        e = _EPOCH_CACHE.get(p)
        if e is None:
            e = json.loads(fs.read_text(p))
            _EPOCH_CACHE[p] = e
        out.append(e)
    out.sort(key=lambda e: e["v"])
    return out


def publish_schema_version(fs, root: str, fields: list[dict], v: int) -> bool:
    """CAS-publish epoch ``v``. False = a concurrent DDL won this version
    number; the caller reloads the log and re-validates its mutation."""
    fs.mkdirs(join_path(root, SCHEMA_DIR))
    return fs.create_exclusive(
        _epoch_path(root, v), json.dumps({"v": v, "fields": fields}, indent=1)
    )


def descend_containers(tjson):
    """``(struct_json | None, rewrap)`` — the struct type json reached
    from ``tjson`` by descending through any chain of array elements /
    map VALUES (map keys are scalar join currency, never evolved), plus a
    function re-wrapping a replacement struct json in the same container
    chain. ``(None, None)`` when no struct underlies the type. This is
    the container convention of the whole nested-id feature: an entry's
    ``fields`` list always describes the struct its type bottoms out in,
    so ``meta``, ``array<struct>``, ``map<string, struct>`` and
    ``array<array<struct>>`` columns all evolve with the same machinery."""
    wraps: list[tuple[str, dict]] = []
    t = tjson
    while isinstance(t, dict) and t.get("type") in ("array", "map"):
        wraps.append((t["type"], t))
        t = t["elementType"] if t["type"] == "array" else t["valueType"]
    if not (isinstance(t, dict) and t.get("type") == "struct"):
        return None, None

    def rewrap(new_struct: dict) -> dict:
        out = new_struct
        for kind, outer in reversed(wraps):
            o = dict(outer)
            o["elementType" if kind == "array" else "valueType"] = out
            out = o
        return out

    return t, rewrap


def _ids_for_type(tjson, alloc) -> list[dict] | None:
    """Recursive nested-id assignment for the struct underlying
    ``tjson`` (or None when none does): every member gets an id, and
    members whose own types bottom out in structs carry their own
    ``fields`` — the full-depth Iceberg shape."""
    st, _ = descend_containers(tjson)
    if st is None:
        return None
    out = []
    for fd in st.get("fields", []):
        e: dict = {"id": alloc(), "name": fd["name"], "type": fd["type"]}
        sub = _ids_for_type(fd["type"], alloc)
        if sub is not None:
            e["fields"] = sub
        out.append(e)
    return out


def fields_from_schema(schema: T.StructType) -> list[dict]:
    """Bootstrap field list: ids assigned in field order, 1-based (the
    epoch-1 snapshot of a pre-DDL table). Columns whose types bottom out
    in structs (plain structs, array<struct>, map<_, struct>, nested
    combinations) also get NESTED field ids at EVERY depth (Iceberg
    assigns ids to every nested field), allocated after the top-level
    block so all namespaces stay globally unique."""
    out = [
        {"id": i + 1, "name": f.name, "type": f.dataType.jsonValue()}
        for i, f in enumerate(schema.fields)
    ]
    ctr = iter(range(len(out) + 1, 1 << 31))
    for entry in out:
        sub = _ids_for_type(entry["type"], lambda: next(ctr))
        if sub is not None:
            entry["fields"] = sub
    return out


def walk_fields(fields: list[dict]):
    """Depth-first iterator over every entry of an epoch's field forest
    (top-level and nested at any depth)."""
    for f in fields:
        yield f
        yield from walk_fields(f.get("fields", []))


def _synth_members(fid: int, tjson, log: list[dict]) -> list[dict] | None:
    """Member-id synthesis for an entry published before ids existed at
    its level: take the FIRST later epoch that assigned ids under the
    same entry id (searched at any depth), filtered to the member names
    the old entry's type json actually holds. Sound because nested
    rename/add/widen all REQUIRE ids: content under an id-less entry is
    name- and type-stable across the id-less epochs, so the first id
    assignment names exactly the old files' physical members."""
    st, _ = descend_containers(tjson)
    if st is None:
        return None
    names = {fd["name"] for fd in st.get("fields", [])}
    for e in log:
        for f in walk_fields(e["fields"]):
            if f["id"] == fid and "fields" in f:
                return [n for n in f["fields"] if n["name"] in names]
    return None


def nested_fields_for(field: dict, log: list[dict]) -> list[dict] | None:
    """The FULLY-RESOLVED member tree of a struct-content field AS OF ITS
    EPOCH: every member carries its id, and members whose types bottom
    out in structs carry their own resolved ``fields`` — with levels the
    epoch predates synthesized via :func:`_synth_members`. None when the
    field has no struct content or no epoch ever assigned ids under it
    (caller falls back to a positional cast — the pre-feature
    behavior)."""
    members = field.get("fields")
    if members is None:
        members = _synth_members(field["id"], field.get("type"), log)
        if members is None:
            return None
    out = []
    for m in members:
        r = dict(m)
        sub = nested_fields_for(m, log)
        if sub is not None:
            r["fields"] = sub
        out.append(r)
    return out


def struct_type_of_fields(nested: list[dict]) -> dict:
    """The type json a nested field-id list describes — kept in the
    entry's ``type`` alongside ``fields`` so every existing consumer of
    ``type`` (scan schemas, epoch matching, align) stays correct."""
    return {
        "type": "struct",
        "fields": [
            {"name": n["name"], "type": n["type"], "nullable": True, "metadata": {}}
            for n in nested
        ],
    }


def retype_entry(entry: dict) -> dict:
    """Recompute an entry's ``type`` json from its (just-mutated)
    ``fields`` list, preserving the container chain (array/map wrappers)
    the struct lives under. The inverse bookkeeping of
    :func:`descend_containers` — called bottom-up along a nested-DDL
    path so ancestors' type jsons always match their member lists."""
    st, rewrap = descend_containers(entry["type"])
    if st is None or rewrap is None:
        raise TypeError(f"retype_entry: {entry['name']!r} has no struct content")
    return {**entry, "type": rewrap(struct_type_of_fields(entry["fields"]))}


def schema_of_fields(fields: list[dict]) -> T.StructType:
    """The Spark StructType a field list describes (fully nullable — the
    same convention the sidecar canonical schema uses)."""
    return T.StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": f["name"], "type": f["type"], "nullable": True, "metadata": {}}
                for f in fields
            ],
        }
    )


def next_field_id(log: list[dict]) -> int:
    """Ids are never reused, even after a drop — scan EVERY epoch at
    EVERY nesting depth (all levels share one namespace), so a
    dropped-then-readded name gets a fresh id and old files correctly
    surface null for the new column."""
    return 1 + max(
        (f["id"] for e in log for f in walk_fields(e["fields"])),
        default=0,
    )


def is_safe_widening(src_json, dst_json) -> bool:
    src = T.StructType.fromJson(
        {"type": "struct", "fields": [{"name": "c", "type": src_json, "nullable": True, "metadata": {}}]}
    ).fields[0].dataType
    dst = T.StructType.fromJson(
        {"type": "struct", "fields": [{"name": "c", "type": dst_json, "nullable": True, "metadata": {}}]}
    ).fields[0].dataType
    if (src.typeName(), dst.typeName()) in _SAFE_WIDENINGS:
        return True
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        # growing precision with the same scale loses nothing
        return dst.scale == src.scale and dst.precision >= src.precision
    return False
