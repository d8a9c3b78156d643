"""Canonical-schema sidecar + write-side alignment.

Reference semantics (parquetranger, /root/reference/parquetranger/core.py):
the first write freezes a canonical schema in a sidecar ``empty.meta``
parquet file (core.py:443-447, created at core.py:397-401); every later
write is cast to it (``_resolve_metadata`` core.py:374-382, ``_cast_table``
core.py:547-558 — un-castable/missing columns become typed nulls, new
columns are dropped unless ``allow_metadata_extension`` widens the schema
and rewrites existing files, core.py:405-421).

Spark-first re-expression: the sidecar is a JSON file ``_pqr_meta.json`` at
the table root (never pickle — the reference pickles user metadata into the
parquet footer, core.py:535-536, which is unsafe and Spark cannot write
custom footer KV anyway). Alignment is a plain ``select`` of casts /
typed-null literals, so it stays entirely inside Catalyst: no-op casts are
removed by the optimizer and column pruning still reaches the parquet scan.
Widening is an explicit O(table) maintenance rewrite, never implicit inside
an append (SURVEY §7.3.7).

The sidecar lives under the table root but Spark's parquet reader ignores
non-``*.parquet`` files, so reads stay untouched.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_FILE_NAME = "_pqr_meta.json"


@dataclass
class TableMeta:
    """Everything the reference kept in parquet footers + empty.meta.

    ``config`` persists the table-level PROPERTIES the creating handle
    was configured with (partitioning, keys, clustering, stats/bloom
    index columns, constraints, codec, commit protocol) so a later
    process can reopen the table via :meth:`TableRepo.open` without
    re-stating them — the catalog-table-properties shape. Older
    sidecars simply lack the key."""

    schema: T.StructType | None = None
    group_cols: list[str] = field(default_factory=list)
    index_cols: list[str] = field(default_factory=list)
    extra_metadata: dict[str, Any] = field(default_factory=dict)
    config: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "schema": self.schema.jsonValue() if self.schema else None,
                "group_cols": self.group_cols,
                "index_cols": self.index_cols,
                "extra_metadata": self.extra_metadata,
                "config": self.config,
            },
            indent=1,
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, raw: str) -> "TableMeta":
        d = json.loads(raw)
        schema = T.StructType.fromJson(d["schema"]) if d.get("schema") else None
        return cls(
            schema=schema,
            group_cols=list(d.get("group_cols") or []),
            index_cols=list(d.get("index_cols") or []),
            extra_metadata=dict(d.get("extra_metadata") or {}),
            config=dict(d.get("config") or {}),
        )


def meta_path(root: str) -> str:
    from ..sources.fs import join_path

    return join_path(root, META_FILE_NAME)


def load_meta(root: str, spark=None) -> TableMeta | None:
    """Read the sidecar through the FS shim (sources/fs.py) — local paths
    use plain ``open``; URI roots go through the Hadoop FileSystem client."""
    from ..sources.fs import fs_for

    fs = fs_for(root, spark=spark)
    p = meta_path(root)
    if not fs.exists(p):
        return None
    return TableMeta.from_json(fs.read_text(p))


def save_meta(root: str, meta: TableMeta, spark=None) -> None:
    """Atomic (write-temp-then-rename) sidecar write through the FS shim."""
    from ..sources.fs import fs_for

    fs = fs_for(root, spark=spark)
    fs.mkdirs(root)
    fs.write_text_atomic(meta_path(root), meta.to_json())


def as_nullable(dt: T.DataType) -> T.DataType:
    """Recursively mark every field/element nullable. Canonical schemas are
    stored fully-nullable: parquet round-trips drop NOT NULL anyway, and
    casts between structs differing only in nullability are rejected by
    Spark."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, as_nullable(f.dataType), True, f.metadata) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(as_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(as_nullable(dt.keyType), as_nullable(dt.valueType), True)
    return dt


def align_to_schema(df: DataFrame, canonical: T.StructType) -> DataFrame:
    """Project/cast ``df`` onto the canonical schema.

    Per canonical field: present → cast to the canonical type; missing →
    typed null (reference ``_cast_table``, core.py:547-558). Columns not in
    the canonical schema are dropped (reference default, core.py:410).
    Matching is case-INSENSITIVE like Spark's own column resolution
    (default spark.sql.caseSensitive=false): an incoming 'TEXT' satisfies
    canonical 'text' instead of being silently replaced by typed nulls —
    unless the frame carries case-colliding duplicates, where only the
    exact name is trusted. Pure column expressions — Catalyst folds no-op
    casts away, so an already-aligned frame compiles to the identity
    projection.
    """
    have = {f.name: f for f in df.schema.fields}
    lower_counts: dict[str, int] = {}
    for f in df.schema.fields:
        lower_counts[f.name.lower()] = lower_counts.get(f.name.lower(), 0) + 1
    by_lower = {
        f.name.lower(): f for f in df.schema.fields if lower_counts[f.name.lower()] == 1
    }
    cols = []
    for f in canonical.fields:
        src_f = have.get(f.name) or by_lower.get(f.name.lower())
        if src_f is not None:
            if src_f.dataType != f.dataType and _has_struct(f.dataType) and _has_struct(src_f.dataType):
                # struct-aware alignment: a positional cast fails outright
                # when a (possibly array-/map-wrapped) canonical struct
                # gained or lost a member (nested schema evolution) —
                # rebuild by NAME at every depth, with missing members as
                # typed nulls and NULL structs kept NULL (F.struct of the
                # children would resurrect them)
                cols.append(
                    _align_expr(
                        F.col(src_f.name), src_f.dataType, f.dataType, src_f.name
                    ).alias(f.name)
                )
            else:
                src = F.col(src_f.name)
                cols.append(
                    src.alias(f.name)
                    if src_f.dataType == f.dataType
                    else src.cast(f.dataType).alias(f.name)
                )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def _has_struct(dt: T.DataType) -> bool:
    """True when ``dt`` bottoms out in a struct through any chain of
    array elements / map values — the shapes nested schema evolution can
    produce, hence the shapes alignment must rebuild by name."""
    if isinstance(dt, T.StructType):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_struct(dt.elementType)
    if isinstance(dt, T.MapType):
        return _has_struct(dt.valueType)
    return False


def _align_expr(expr, src_dt: T.DataType, tgt_dt: T.DataType, path: str):
    """By-name recursive alignment of one expression onto the canonical
    type: structs rebuild member-wise (missing → typed null, NULL structs
    stay NULL), arrays/maps recurse per element through ``transform`` /
    ``transform_values`` — one codegen projection, no explosion. Unknown
    incoming members raise at ANY depth: they would be silently DISCARDED
    from every written row — unlike top-level extra columns
    (reference-convention drop, core.py:410) nested members have no
    widening path, so keep it loud."""
    if src_dt == tgt_dt:
        return expr
    if isinstance(tgt_dt, T.ArrayType) and isinstance(src_dt, T.ArrayType):
        return F.when(
            expr.isNotNull(),
            F.transform(
                expr,
                lambda x: _align_expr(
                    x, src_dt.elementType, tgt_dt.elementType, path + "[]"
                ),
            ),
        ).otherwise(F.lit(None).cast(tgt_dt))
    if isinstance(tgt_dt, T.MapType) and isinstance(src_dt, T.MapType):
        aligned = F.transform_values(
            expr,
            lambda _k, v: _align_expr(
                v, src_dt.valueType, tgt_dt.valueType, path + "{}"
            ),
        )
        if src_dt.keyType != tgt_dt.keyType:
            # keys align too (map<int,…> vs canonical map<bigint,…>):
            # keys can themselves be structs, so recurse, not just cast
            aligned = F.transform_keys(
                aligned,
                lambda k, _v: _align_expr(
                    k, src_dt.keyType, tgt_dt.keyType, path + "{k}"
                ),
            )
        return F.when(expr.isNotNull(), aligned).otherwise(
            F.lit(None).cast(tgt_dt)
        )
    if not (isinstance(tgt_dt, T.StructType) and isinstance(src_dt, T.StructType)):
        return expr.cast(tgt_dt)
    have = {c.name.lower(): c for c in src_dt.fields}
    unknown = sorted(
        c.name
        for c in src_dt.fields
        if c.name.lower() not in {g.name.lower() for g in tgt_dt.fields}
    )
    if unknown:
        raise ValueError(
            f"write carries struct members {path}.{unknown} unknown to "
            "the canonical schema — run add_struct_field (or drop them) "
            "before writing; silently discarding nested values is never ok"
        )
    parts = []
    for c in tgt_dt.fields:
        s = have.get(c.name.lower())
        if s is None:
            parts.append(F.lit(None).cast(c.dataType).alias(c.name))
        else:
            parts.append(
                _align_expr(
                    expr.getField(s.name), s.dataType, c.dataType, f"{path}.{s.name}"
                ).alias(c.name)
            )
    return (
        F.when(expr.isNotNull(), F.struct(*parts))
        .otherwise(F.lit(None).cast(tgt_dt))
    )


def widen_schema(canonical: T.StructType, incoming: T.StructType) -> tuple[T.StructType, bool]:
    """Append fields of ``incoming`` unknown to ``canonical`` (reference
    ``allow_metadata_extension``, core.py:405-421). Returns (schema, grew)."""
    known = {f.name for f in canonical.fields}
    new_fields = [f for f in incoming.fields if f.name not in known]
    if not new_fields:
        return canonical, False
    return T.StructType(list(canonical.fields) + [T.StructField(f.name, f.dataType, True) for f in new_fields]), True


def resolve_path_type(schema: T.StructType, dotted: str) -> T.DataType | None:
    """The declared type of a dotted nested path (``props.email``,
    ``frames.tags`` where ``frames`` is ``array<struct>``), descending
    transparently through array elements / map VALUES — the container
    convention of the nested-DDL machinery (schema_log
    ``descend_containers``). ``None`` when any segment is missing or a
    non-final segment bottoms out in a non-struct."""
    dt: T.DataType = schema
    for seg in dotted.split("."):
        while isinstance(dt, (T.ArrayType, T.MapType)):
            dt = dt.elementType if isinstance(dt, T.ArrayType) else dt.valueType
        if not isinstance(dt, T.StructType):
            return None
        hit = next((f for f in dt.fields if f.name == seg), None)
        if hit is None:
            return None
        dt = hit.dataType
    return dt


def mask_path_expr(col_expr, dt: T.DataType, path: list[str], mask_col):
    """Rewrite the nested field at ``path`` inside ``col_expr`` (typed
    ``dt``) to ``mask_col`` — structs via ``withField`` (NULL structs
    stay NULL: update on null yields null), array/map containers via
    ``transform`` / ``transform_values`` so every element is rewritten.
    ``mask_col`` is evaluated in ROW context (it may reference other
    columns, like top-level masks), not per element."""
    if isinstance(dt, T.ArrayType):
        return F.when(
            col_expr.isNotNull(),
            F.transform(
                col_expr,
                lambda e: mask_path_expr(e, dt.elementType, path, mask_col),
            ),
        ).otherwise(F.lit(None).cast(dt))
    if isinstance(dt, T.MapType):
        return F.when(
            col_expr.isNotNull(),
            F.transform_values(
                col_expr,
                lambda _k, v: mask_path_expr(v, dt.valueType, path, mask_col),
            ),
        ).otherwise(F.lit(None).cast(dt))
    assert isinstance(dt, T.StructType), "resolved mask path must hit structs"
    seg = path[0]
    fdt = next(f.dataType for f in dt.fields if f.name == seg)
    if len(path) == 1:
        return col_expr.withField(seg, mask_col.cast(fdt))
    return col_expr.withField(
        seg, mask_path_expr(col_expr.getField(seg), fdt, path[1:], mask_col)
    )
