"""Embedding similarity search (SURVEY §2.4 X3): brute-force cosine top-k
as the exactness baseline, random-hyperplane-LSH bucketed top-k as the
scale path.

Scale design: brute force is a broadcast of the (small) query side against
a full corpus scan — one pass, no corpus shuffle, top-k via per-query
window. The LSH path replaces the corpus-wide scan with an equi-join on
bucket keys, turning O(|Q|·|C|) into O(Σ bucket sizes); recall is tested
in tests/test_pipeline_ops.py.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, hyperplane_bits


def default_planes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic (seeded) random hyperplanes, generated driver-side as
    literals — no RNG in executors, so retries are stable."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def topk_cosine_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. The query side is
    broadcast (it is the small side by contract); ranking is a window per
    query id with a deterministic (similarity desc, id) tie-break."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def topk_cosine_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent random-hyperplane
    sketches; a corpus vector is a candidate when it shares any table's
    bucket with the query. Join on (table, bucket) — shuffle-bounded, never
    a cross join. Exact cosine + window rank within candidates."""
    if dim is None:
        row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(row["d"])
    buckets = []
    for t in range(n_tables):
        planes = default_planes(dim, n_planes, seed=42 + t)
        buckets.append((t, planes))

    def with_buckets(df: DataFrame, idname: str, vecname: str) -> DataFrame:
        entries = F.array(
            *[
                F.struct(F.lit(t).alias("tbl"), hyperplane_bits(F.col(vec_col), planes).alias("bucket"))
                for t, planes in buckets
            ]
        )
        return df.select(
            F.col(id_col).alias(idname), F.col(vec_col).alias(vecname), F.explode(entries).alias("tb")
        ).select(idname, vecname, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    qb = with_buckets(queries, "query_id", "qv")
    cb = with_buckets(corpus, "neighbor_id", "cv")
    cands = (
        qb.join(cb, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cands.select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
