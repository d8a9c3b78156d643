"""Declared queries for nested-object ingestion (SURVEY.md §2.1 S12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.ingestor import key_code, schema_code, shred_json_df
from . import query
from .common import load, scratch_dir

# the nested object built per event (see json_shred_counts below) has a
# fixed shape, so every (path, schema-hash) table address is computable
# up front — the oracle pins them as literals
_ROOT_TBL = schema_code({"id_": "int", "etype": "str", "val": "float"})
_PROPS_TBL = "/".join([key_code("props"), schema_code({"k": "int", "__parent_id": "int"})])
_MARKS_TBL = "/".join(
    [key_code("marks"), "list", schema_code({"m": "int", "__parent_id": "int"})]
)

_JSON_SHRED_ORACLE = f"""
SELECT '{_ROOT_TBL}' AS tbl, count(*) AS n FROM events
UNION ALL
SELECT '{_PROPS_TBL}' AS tbl, count(*) AS n FROM events
UNION ALL
SELECT '{_MARKS_TBL}' AS tbl, CAST(SUM(event_id % 3) AS BIGINT) AS n FROM events
"""


@query("json_shred_counts", oracle=_JSON_SHRED_ORACLE)
def json_shred_counts(spark, sf_dir):
    """S12: distributed JSON shredding (reference ObjIngestor.ingest,
    ingestor.py:49-82) — nested objects split into a forest of tables
    addressed by (path, schema-hash), children linked via __parent_id.

    Builds a nested object per event (atoms + a nested dict + a variable
    -length list), shreds with one mapInPandas pass + per-table distributed
    materialization, and returns per-table row counts.
    """
    ev = load(spark, sf_dir, "events")
    n_marks = F.col("event_id") % 3
    obj = F.to_json(
        F.struct(
            F.col("event_id").alias("id_"),
            F.col("event_type").alias("etype"),
            F.col("value").alias("val"),
            F.from_json("props", "k long").alias("props"),
            F.when(
                n_marks > 0,
                F.transform(
                    F.sequence(F.lit(0), (n_marks - 1).cast("int")),
                    lambda j: F.struct(j.cast("long").alias("m")),
                ),
            )
            .otherwise(F.array().cast("array<struct<m:bigint>>"))
            .alias("marks"),
        )
    )
    root = scratch_dir("shred")
    counts = shred_json_df(ev.select(obj.alias("obj")), "obj", root, root_id_key="id_")
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(counts.items())], "tbl string, n long"
    )
