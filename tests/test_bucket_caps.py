"""LSH bucket-cap tests: a planted mega-cluster (viral duplicate) must not
make candidate generation quadratic, and capping must not change results on
non-degenerate data.

The reference has no counterpart (it does no near-dedup at all); this guards
the 100 TB failure mode where one (band, bucket) holds millions of identical
documents and the bucket self-join alone dwarfs the rest of the job.
"""

import pytest
from pyspark.sql import functions as F

from parquetranger_spark.operators.dedup import (
    candidate_pairs_minhash,
    near_dedup_embedding,
    near_dedup_minhash,
    near_dedup_simhash,
)
from parquetranger_spark.operators.similarity import topk_cosine_lsh

CLUSTER = 200  # planted viral duplicates
CAP = 20


@pytest.fixture(scope="module")
def viral_docs(spark):
    """30 distinct docs (3 with an injected near-dup) + CLUSTER identical
    copies of one viral text."""
    rows = []
    for i in range(30):
        text = " ".join(f"w{i}t{j}" for j in range(25))
        rows.append((i, text))
        if i % 10 == 0:
            rows.append((i + 1_000_000, text + " tail token"))
    for c in range(CLUSTER):
        rows.append((5_000_000 + c, "viral meme text " * 10))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pair_count(df):
    return df.count()


def test_minhash_cap_bounds_candidates_and_keeps_recall(spark, viral_docs):
    uncapped = candidate_pairs_minhash(viral_docs).cache()
    capped = candidate_pairs_minhash(viral_docs, bucket_cap=CAP).cache()
    n_un, n_cap = uncapped.count(), capped.count()
    # uncapped: the viral cluster alone is C(200,2) = 19900 pairs
    assert n_un >= CLUSTER * (CLUSTER - 1) // 2
    # capped: cluster cost drops from O(n²) to O(n·cap)
    assert n_cap <= CLUSTER * CAP + 500
    # every candidate pair not touching the cluster survives identically
    non_cluster = F.col("id_a") < 5_000_000
    a = {tuple(r) for r in uncapped.where(non_cluster & (F.col("id_b") < 5_000_000)).collect()}
    b = {tuple(r) for r in capped.where(non_cluster & (F.col("id_b") < 5_000_000)).collect()}
    assert a == b
    # end-to-end: injected near-dup pairs still verified at threshold
    pairs = near_dedup_minhash(viral_docs, threshold=0.6, bucket_cap=CAP).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert {(i, i + 1_000_000) for i in (0, 10, 20)} <= found
    uncapped.unpersist()
    capped.unpersist()


def test_simhash_cap_bounds_candidates_and_keeps_recall(spark, viral_docs):
    uncapped = near_dedup_simhash(viral_docs, max_hamming=6)
    capped = near_dedup_simhash(viral_docs, max_hamming=6, bucket_cap=CAP)
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un >= CLUSTER * (CLUSTER - 1) // 2
    assert n_cap < n_un / 4
    # non-cluster results identical
    non_cluster = (F.col("id_a") < 5_000_000) & (F.col("id_b") < 5_000_000)
    a = {tuple(r) for r in uncapped.where(non_cluster).collect()}
    b = {tuple(r) for r in capped.where(non_cluster).collect()}
    assert a == b
    hits = sum(1 for (x, y, _) in b if y == x + 1_000_000)
    assert hits >= 2  # injected near-dups still found


def test_embedding_cap_bounds_candidates(spark):
    # 150 identical vectors + 20 direction-separated ones with a perturbed
    # twin each (random gauss directions: distinct vectors land in their
    # own buckets, so only the planted cluster bucket exceeds the cap)
    import random

    rng = random.Random(7)
    rows = [(5_000_000 + c, [1.0, 2.0, 3.0, 4.0]) for c in range(150)]
    for i in range(20):
        v = [rng.gauss(0.0, 1.0) for _ in range(4)]
        rows.append((i, v))
        rows.append((i + 1_000_000, [x * 1.0001 for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = near_dedup_embedding(df, threshold=0.999)
    capped = near_dedup_embedding(df, threshold=0.999, bucket_cap=CAP)
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un >= 150 * 149 // 2
    assert n_cap < n_un / 4
    found = {
        (r.id_a, r.id_b)
        for r in capped.where((F.col("id_a") < 5_000_000) & (F.col("id_b") < 5_000_000)).collect()
    }
    assert {(i, i + 1_000_000) for i in range(20)} <= found


def test_lsh_topk_cap_keeps_planted_neighbors(spark):
    # corpus: 300 copies of one vector (mega-bucket) + 30 distinct vectors;
    # probes are perturbed twins of the distinct vectors
    rows = [(5_000_000 + c, [1.0, 1.0, 1.0, 1.0]) for c in range(300)]
    for i in range(30):
        rows.append((i, [float(i + 1), float(3 * i + 2), 1.0, float(i % 7)]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = corpus.where(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.0001).alias("embedding"),
    )
    got = topk_cosine_lsh(probes, corpus, k=1, bucket_cap=CAP).toPandas()
    assert len(got) == 30
    assert (got.neighbor_id == got.query_id - 1_000_000).all()


def test_caps_are_noop_on_clean_corpus(spark, sf_dir):
    """On the driver corpus (no viral buckets at a generous cap) capped and
    uncapped results are row-identical — the cap only engages on degenerate
    data, so oracle hashes are safe with caps enabled."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    a = near_dedup_minhash(docs, threshold=0.6)
    b = near_dedup_minhash(docs, threshold=0.6, bucket_cap=1000)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_incremental_dedup_salted_history_keeps_recall(spark):
    """Salting an oversized HISTORY bucket must not lose batch↔history
    matches: the probe side fans over every salt (asymmetric join), so
    unlike self-join salting there is NO recall trade at all."""
    import pandas as pd

    from parquetranger_spark.operators.dedup import (
        incremental_near_dedup,
        minhash_index,
    )

    # 300 identical history docs → one viral (band, bucket) per band
    hist = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(300),
                "text": ["alpha beta gamma delta epsilon zeta eta theta"] * 300,
            }
        )
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [9001, 9002],
                "text": [
                    "alpha beta gamma delta epsilon zeta eta theta iota",  # near-dup
                    "completely different words entirely here now okay yes",
                ],
            }
        )
    )
    idx = minhash_index(hist)
    flagged_capped = {
        r["doc_id"]
        for r in incremental_near_dedup(new, hist, idx, threshold=0.6, bucket_cap=50).collect()
    }
    assert flagged_capped == {9001}


def test_minhash_index_roundtrips_through_repo(spark, tmp_path, sf_dir):
    """The LSH index persists in a band-partitioned TableRepo and the
    incremental dedup reads it back unchanged — the storage loop a
    nightly refresh actually runs."""
    import pandas as pd

    from parquetranger_spark import TableRepo
    from parquetranger_spark.operators.dedup import (
        incremental_near_dedup,
        minhash_index,
    )

    hist = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    repo = TableRepo(str(tmp_path) + "/mh_index", group_cols="band",
                     single_writer=True, spark=spark)
    repo.extend(minhash_index(hist))
    new = hist.limit(5).select(
        (hist.doc_id + 900000).alias("doc_id"), "text"  # exact copies
    )
    flagged = incremental_near_dedup(new, hist, repo.get_full_df(), threshold=0.6)
    assert flagged.count() == 5  # every copy caught via the stored index


def test_incremental_dedup_rejects_mismatched_index_params(spark):
    import pandas as pd

    import pytest

    from parquetranger_spark.operators.dedup import (
        incremental_near_dedup,
        minhash_index,
    )

    hist = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d e f", "g h i j k l"]})
    )
    idx = minhash_index(hist, num_hashes=16, bands=8)
    with pytest.raises(ValueError, match="hash famil"):
        incremental_near_dedup(hist, hist, idx, num_hashes=32, bands=16)
