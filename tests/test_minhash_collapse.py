"""Fingerprint-collapse tests for near_dedup_minhash (round-7 verdict item
1): collapsing identical-shingle-set documents into super-nodes before LSH
must be result-invisible (zero recall loss, identical Jaccard values) while
bounding candidate growth on dup-dense corpora.

The reference has no near-dedup; the collapse mirrors its keyed-upsert
pre-join dedup idea (reference core.py:119) at the LSH layer.
"""

import pyspark.sql.functions as F
import pytest

from parquetranger_spark.operators.dedup import (
    candidate_pairs_minhash,
    near_dedup_minhash,
    shingle_fingerprints,
)


def _pairs(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dups = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat("text", F.lit(" xtra xtra")).alias("text"),
    )
    return docs.unionByName(dups)


def test_collapse_identical_on_dup_dense(spark, corpus):
    """2x exact replication: the collapse path (engaged — 50% duplication)
    returns exactly the direct path's pairs, Jaccard values included."""
    rep = corpus.unionByName(corpus.withColumn("doc_id", F.col("doc_id") + 10_000_000))
    assert _pairs(near_dedup_minhash(rep, collapse=True)) == _pairs(
        near_dedup_minhash(rep, collapse=False)
    )


def test_collapse_identical_on_distinct(spark, corpus):
    """Mostly-distinct corpus: the adaptive probe falls back to the direct
    plan; results must still match the forced-direct run."""
    assert _pairs(near_dedup_minhash(corpus, collapse=True)) == _pairs(
        near_dedup_minhash(corpus, collapse=False)
    )


def test_collapse_edge_docs(spark):
    """Short docs (single whole-text shingle), empty and NULL text follow
    the same drop/collapse rules on both paths."""
    edge = spark.createDataFrame(
        [
            (1, "a b"),
            (2, "a b"),
            (3, "   "),
            (4, None),
            (5, "x y z w v u t s"),
            (6, "x y z w v u t s q"),
        ],
        "doc_id long, text string",
    )
    got = _pairs(near_dedup_minhash(edge, threshold=0.6, collapse=True))
    assert got == _pairs(near_dedup_minhash(edge, threshold=0.6, collapse=False))
    # the identical short docs pair at exactly 1.0; empty/NULL never appear
    assert (1, 2, 1.0) in got
    assert not any(3 in (a, b) or 4 in (a, b) for a, b, _ in got)


def test_viral_cluster_expands_to_full_clique(spark):
    """k identical docs collapse to ONE LSH node but the output still holds
    all C(k,2) pairs at Jaccard exactly 1.0 (star expansion, not sampling) —
    while candidate generation over the collapsed reps sees ONE node: the
    uncapped candidate self-join stays O(distinct²), not O(k²)."""
    k = 60
    rows = [(i, "viral meme text " * 10) for i in range(k)]
    rows += [(1000 + i, f"doc {i} " + " ".join(f"w{i}t{j}" for j in range(20))) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = near_dedup_minhash(df, threshold=0.6).toPandas()
    clique = out[(out.id_a < k) & (out.id_b < k)]
    assert len(clique) == k * (k - 1) // 2
    assert (clique.jaccard == 1.0).all()
    # the collapsed corpus holds 6 distinct fingerprints -> <= C(6,2)
    fps = shingle_fingerprints(df).select("__fp").distinct().count()
    assert fps == 6
    reps = (
        shingle_fingerprints(df)
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    rep_cands = candidate_pairs_minhash(df.join(reps, "doc_id", "left_semi"))
    assert rep_cands.count() <= 15
