"""Chunking, packing, and stratified-sampling operators
(operators/packing.py, operators/curation.py::stratified_sample_pred).

Correctness is pinned on tiny synthetic frames where the expected chunk
layout / bin assignment is hand-computable; plan gates assert the
zero-shuffle chunking shape and the broadcast dim-join shape the 100 TB
story needs."""

import pyspark.sql.functions as F

from parquetranger_spark.operators.curation import stratified_sample_pred
from parquetranger_spark.operators.packing import chunk_documents, pack_by_offset


from tests.test_plans import plan


def toks(n: int) -> str:
    return " ".join(f"t{i}" for i in range(n))


def test_chunk_documents_layout(spark):
    df = spark.createDataFrame(
        [(1, toks(10)), (2, toks(4)), (3, "solo")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_tokens))
    # doc 1: starts 0,3,6,9 → lengths 4,4,4,1
    assert sorted(by_doc[1]) == [(0, 4), (1, 4), (2, 4), (3, 1)]
    # doc 2: starts 0,3 → lengths 4,1
    assert sorted(by_doc[2]) == [(0, 4), (1, 1)]
    # doc 3: one token, one chunk
    assert by_doc[3] == [(0, 1)]


def test_chunk_documents_overlap_content(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    out = chunk_documents(df, chunk_size=3, stride=2).collect()
    # chunks: [a b c], [c d e], [e] — verify via hashes of the expected text
    import hashlib

    expect = {hashlib.md5(t.encode()).hexdigest() for t in ["a b c", "c d e", "e"]}
    assert {r.chunk_hash for r in out} == expect


def test_chunk_documents_no_shuffle(spark):
    df = spark.createDataFrame([(1, toks(10))], "doc_id long, text string")
    p = plan(chunk_documents(df))
    assert "Exchange" not in p, p


def test_pack_by_offset_bins(spark):
    # shard 0 only; counts 300, 300, 300, 200 at capacity 512:
    # offsets 0, 300, 600, 900 → bins 0, 0, 1, 1
    rows = [(0, 300), (8, 300), (16, 300), (24, 200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_by_offset(df, capacity=512, n_shards=8).collect()
    got = {r.doc_id: (r.shard, r.bin_id) for r in out}
    assert got == {0: (0, 0), 8: (0, 0), 16: (0, 1), 24: (0, 1)}


def test_pack_by_offset_shards_independent(spark):
    # same counts in two shards pack identically and never interleave
    rows = [(s + 8 * i, 400) for s in (1, 2) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_by_offset(df, capacity=512, n_shards=8).collect()
    for s in (1, 2):
        bins = sorted(r.bin_id for r in out if r.shard == s)
        assert bins == [0, 0, 1]  # offsets 0, 400, 800


def test_stratified_sample_deterministic_and_rated(spark):
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    pred = stratified_sample_pred(F.col("k"), F.col("lang"), {"en": "19"}, "7f")
    a = {r.k for r in df.where(pred).collect()}
    b = {r.k for r in df.where(pred).collect()}
    assert a == b  # pure function of the key
    en = sum(1 for k in a if k % 2 == 0) / 2000
    de = sum(1 for k in a if k % 2 == 1) / 2000
    assert 0.06 < en < 0.15  # ~26/256
    assert 0.44 < de < 0.57  # ~128/256


def test_dim_join_agg_broadcasts(spark, sf_dir):
    from parquetranger_spark.queries.compute import events_dim_join_agg

    p = plan(events_dim_join_agg(spark, sf_dir))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


# ---------------------------------------------------------- property tests

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="abcxyz", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=1, max_size=30).map(" ".join)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(DOC, min_size=1, max_size=6), data=st.data())
def test_chunk_documents_covers_every_token(spark, docs, data):
    """Every token position is covered, chunk starts advance by exactly
    stride, and per-chunk token counts match the python reference."""
    chunk_size = data.draw(st.integers(2, 6))
    stride = data.draw(st.integers(1, chunk_size))
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = chunk_documents(df, chunk_size=chunk_size, stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.n_tokens
    for i, doc in enumerate(docs):
        n = len(doc.split(" "))
        starts = list(range(0, n, stride))
        want = {j: min(chunk_size, n - s) for j, s in enumerate(starts)}
        assert by_doc[i] == want, (doc, chunk_size, stride)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(st.integers(1, 300), min_size=1, max_size=20),
    capacity=st.integers(50, 400),
)
def test_pack_by_offset_matches_python_reference(spark, counts, capacity):
    """Bin assignment equals the python offset-packing reference: every
    doc assigned exactly once, to floor(cum_before / capacity) of its
    shard-ordered prefix sum."""
    rows = [(i, c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_by_offset(df, capacity=capacity, n_shards=4)
    got = {(r.shard, r.doc_id): r.bin_id for r in out.collect()}
    want = {}
    for shard in range(4):
        cum = 0
        for i, c in sorted(rows):
            if i % 4 != shard:
                continue
            want[(shard, i)] = cum // capacity
            cum += c
    assert got == want
