"""Round-10 verdict/advice fixes.

- Legacy (pre-epoch-column) PQ retrain is ATOMIC: books + whole-table
  re-encode + old-epoch retirement land as ONE transaction, and
  query_pq falls back to the OLDEST epoch's books when a pre-existing
  crashed two-commit state is encountered (round-9 advice, medium).
- A growth/skew split sweep is bounded by ``max_split_lists`` —
  commit breadth stays bounded, converging over repeated maintain()
  calls (round-9 advice, low).
- Grown-from-small serving holds the IVF design point: after growth
  sweeps n_lists sits in a √n band AND recall@5 vs exact brute force
  stays ≥ 0.7 (round-9 verdict #8 — promoted from probe-only evidence
  into the always-on suite).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from parquetranger_spark.operators.ann_index import AnnIndex, _PQ_META_SCHEMA
from parquetranger_spark.operators.similarity import (
    topk_cosine_bruteforce,
    train_pq_codebooks,
)


def _vectors(spark, n, dim=8, seed=7, id0=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(id0, id0 + n), "embedding": [list(map(float, r)) for r in v]}
    )
    return spark.createDataFrame(pdf)


@pytest.fixture()
def idx(spark, tmp_root):
    return AnnIndex(tmp_root + "/idx10", spark=spark)


def _topsets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _make_legacy(idx):
    """Rewrite the postings table into the r8 on-disk shape: NO
    ``pq_epoch`` column in the canonical schema (a plain replace_all
    with the column dropped would re-align it back in as nulls — the
    legacy shape needs the schema itself to lack the column, which only
    a purge + fresh create produces)."""
    rows = idx.postings.get_full_df().drop("pq_epoch").localCheckpoint(eager=True)
    idx.postings.purge()
    idx.postings.replace_all(rows)
    assert "pq_epoch" not in idx.postings.get_full_df().columns


def test_legacy_pq_crash_state_serves_oldest_epoch(spark, idx):
    """A pre-epoch-column postings table caught in the OLD two-commit
    retrain's crash window (epoch-1 books published, zero rows
    re-encoded or stamped): every code on disk came from epoch 0's
    books, so ADC must score against THOSE — not the newest epoch."""
    corpus = _vectors(spark, 300, seed=3).cache()
    idx.build(corpus, n_lists=6, seed=1, pq_m=4, pq_codes=16)
    # strip the epoch stamp: the legacy on-disk shape
    _make_legacy(idx)
    q = corpus.where(F.col("vec_id") < 8)
    baseline = _topsets(idx.query_pq(q, k=3, n_probe=6, exclude_self=False))
    # publish DIFFERENT epoch-1 books with no re-encode — the crash state
    books1 = train_pq_codebooks(
        idx.postings.get_full_df(), vec_col="cv", m=4, n_codes=16, seed=99
    )
    meta0 = idx._load_pq_metas()[0]
    idx._pq_repo().extend(
        spark.createDataFrame(
            [(1, 4, 16, books1, float(meta0["train_mse"]))], _PQ_META_SCHEMA
        )
    )
    got = _topsets(idx.query_pq(q, k=3, n_probe=6, exclude_self=False))
    assert got == baseline  # scored against epoch 0 (the code producer)


def test_legacy_pq_repair_is_one_txn_and_stamps_epochs(spark, idx):
    """maintain() on the legacy crash state repairs in ONE transaction:
    afterwards exactly one epoch is live, every row is stamped with it,
    and serving returns self at rank 1 through the repaired codes. The
    atomicity is structural (books replace_all + postings replace_all
    ride the same fenced Transaction), asserted here by the absence of
    any surviving mixed state plus version parity of the two tables."""
    corpus = _vectors(spark, 300, seed=4).cache()
    idx.build(corpus, n_lists=6, seed=1, pq_m=4, pq_codes=16)
    _make_legacy(idx)
    books1 = train_pq_codebooks(
        idx.postings.get_full_df(), vec_col="cv", m=4, n_codes=16, seed=99
    )
    meta0 = idx._load_pq_metas()[0]
    idx._pq_repo().extend(
        spark.createDataFrame(
            [(1, 4, 16, books1, float(meta0["train_mse"]))], _PQ_META_SCHEMA
        )
    )
    assert idx.maintain(split_factor=None, pq_drift=0.25)["pq_retrained"] is True
    metas = idx._load_pq_metas()
    assert list(metas) == [1]
    post = idx.postings.get_full_df()
    assert "pq_epoch" in post.columns
    assert post.where(F.col("pq_epoch") != 1).count() == 0
    q = corpus.where(F.col("vec_id") < 8)
    got = idx.query_pq(q, k=3, n_probe=6, rerank=30, exclude_self=False)
    top = {r["query_id"]: r["neighbor_id"] for r in got.where("rank = 1").collect()}
    assert top and all(qid == nid for qid, nid in top.items())


def test_split_sweep_bounded_by_max_split_lists(spark, idx):
    """A growth sweep on a badly-outgrown routing table used to select
    MOST lists and commit every rewrite in one transaction; the sweep is
    now capped at ``max_split_lists`` (most-oversized first), converging
    over repeated maintain() calls like the skew path."""
    corpus = _vectors(spark, 2000, seed=5).cache()
    idx.build(corpus, n_lists=4, seed=1)  # √2000 ≈ 44 ≫ 1.3 × 4: growing
    res = idx.maintain(
        split_factor=4.0, min_split_rows=16, merge=False, max_split_lists=2
    )
    assert res["split"] and len(res["split"]) <= 2
    n_after = idx.centroids.count_rows()
    assert n_after > 4  # the bounded sweep still made progress
    # conservation under the cap: every vector exactly once
    assert idx.postings.count_rows() == 2000
    assert idx.postings.get_full_df().select("vec_id").distinct().count() == 2000
    # repeated bounded sweeps keep converging toward √n
    for _ in range(12):
        if not idx.maintain(
            split_factor=4.0, min_split_rows=16, merge=False, max_split_lists=2
        )["split"]:
            break
    assert idx.centroids.count_rows() > n_after


def test_grown_index_sqrt_band_and_recall(spark, idx):
    """Round-9 verdict #8 promotion: after an index built small grows 9×
    via add() + growth sweeps, n_lists must sit in a √n band and
    recall@5 against exact brute force must hold ≥ 0.7 — the probe-only
    `ann_index_grown_query` claim, now asserted in the suite."""
    small = _vectors(spark, 400, seed=2).cache()
    idx.build(small, seed=1)  # n_lists = √400 = 20
    added = _vectors(spark, 3600, seed=9, id0=10_000).cache()
    idx.add(added)
    for _ in range(8):  # growth sweeps converge
        if not idx.maintain(split_factor=4.0, min_split_rows=32, merge=False)[
            "split"
        ]:
            break
    n = idx.postings.count_rows()
    assert n == 4000
    n_lists = idx.centroids.count_rows()
    root = int(np.sqrt(n))  # ≈ 63
    assert 0.5 * root <= n_lists <= 2.0 * root, (n_lists, root)
    # recall@5 vs exact brute force over the full grown corpus
    qs = small.where(F.col("vec_id") < 20)
    full = small.unionByName(added)
    truth = _topsets(topk_cosine_bruteforce(qs, full, k=5))
    approx = _topsets(idx.query(qs, k=5, n_probe=8))
    hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    recall = hits / (5 * len(truth))
    assert recall >= 0.7, recall
