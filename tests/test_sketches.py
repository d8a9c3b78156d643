"""Accuracy contracts for the sketch tier (X9): the declared queries are
rows-only (sketch internals are engine-specific), so correctness is
asserted here against exact answers — the same split the ANN queries use.
"""

import __spark_entry__ as m
from pyspark.sql import functions as F

from parquetranger_spark.queries.common import load


def test_approx_distinct_within_5pct(spark, sf_dir):
    # the 5% HLL-vs-exact contract is asserted IN-PLAN (assert_true) —
    # a successful collect IS the accuracy check; the emitted surface
    # must equal the exact distinct counts
    got = {
        r["event_type"]: r["n_users"]
        for r in m.queries()["events_approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_token_quantiles_bracket_exact_median(spark, sf_dir):
    got = {
        r["lang"]: r for r in m.queries()["token_quantiles_approx"](spark, sf_dir).collect()
    }
    toks = load(spark, sf_dir, "documents").select(
        "lang", F.size(F.split(F.col("text"), " ")).alias("n")
    )
    for lang, row in got.items():
        assert row["p25"] <= row["p50"] <= row["p75"]
        band = (
            toks.where(F.col("lang") == lang)
            .agg(F.expr("percentile(n, array(0.4, 0.6))").alias("b"))
            .first()["b"]
        )
        assert band[0] <= row["p50"] <= band[1] or abs(row["p50"] - band[0]) <= 2


def test_stream_dedup_matches_batch(spark, sf_dir):
    row = m.queries()["stream_dedup_exact"](spark, sf_dir).first()
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.where(F.col("doc_id") % 7 == 0).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    exact = corpus.agg(
        F.countDistinct(F.md5("text")).alias("u"), F.count(F.lit(1)).alias("n")
    ).first()
    assert row["n_unique"] == exact["u"]
    assert row["n_docs"] == exact["n"]


def test_hll_union_estimate_within_5pct(spark, sf_dir):
    # the union-merged estimate's 5% contract is asserted IN-PLAN; the
    # surfaced n_users is the exact distinct count
    row = m.queries()["events_hll_union"](spark, sf_dir).first()
    exact = (
        load(spark, sf_dir, "events").agg(F.countDistinct("user_id").alias("n")).first()["n"]
    )
    assert row["n_users"] == exact
    assert row["n_types"] == 5


def test_cms_estimates_bound_exact_counts(spark, sf_dir):
    """CMS sketch-then-exact-rescan: the emitted heavy hitters carry
    EXACT counts (the rescan), the ≥-exact upper-bound contract is
    asserted in-query, and no true heavy hitter can be missed (CMS never
    underestimates ⇒ candidate superset)."""
    from parquetranger_spark.queries.common import load
    from parquetranger_spark.queries.sketches import events_cms_heavy_hitters

    got = {r["event_type"]: r for r in events_cms_heavy_hitters(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events")
    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(exact.values())
    heavy = {t: e for t, e in exact.items() if e >= n // 10}
    assert set(got) == set(heavy)
    for t, e in heavy.items():
        assert got[t]["n"] == e
        assert got[t]["n_total"] == n
