"""Round-6 hardening regressions that fit no feature suite."""

import pytest
from pyspark.sql import functions as F

from parquetranger_spark.sources.table_repo import TableRepo


def test_dv_tombstones_cast_to_canonical_key_types(spark, tmp_root, tmp_path):
    """A dv keys frame handed with the WRONG key type (string vs bigint)
    used to write a tombstone that matched nothing on the batch read and
    crashed the CDF stream's arrow batch builder. The write now casts to
    the canonical key type."""
    t = TableRepo(
        f"{tmp_root}/t", index_cols="k", commit_mode="manifest", spark=spark
    )
    t.extend(spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, s string"))
    t.delete_records_dv(spark.createDataFrame([("1",)], "k string"))
    assert {r.k for r in t.get_full_df().collect()} == {2}

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
    assert any(r._change_type == "delete" and r.k == 1 for r in rows)
