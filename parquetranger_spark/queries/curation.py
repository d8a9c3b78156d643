"""Declared queries for the curation + temporal tiers (SURVEY §2.4 X7–X8).

Exactness: fractions are single double divisions of exact integers
(identical both engines); timestamps surface as epoch-nanos int64 only
(the engine reads TIMESTAMP(NANOS) as long, the oracle uses epoch_ns) —
see queries/__init__ for the rules.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.curation import dedup_against_snapshot, repetition_stats, stable_sample_pred
from ..operators.temporal import asof_join_backward, funnel_stages, range_join_count
from . import query
from .common import load

# ------------------------------------------------------------- curation (X7)


@query(
    "quality_repetition",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
top AS (
  SELECT doc_id, max(c) AS top_word_count FROM (
    SELECT doc_id, word, count(*) AS c
    FROM (SELECT doc_id, unnest(w) AS word FROM w)
    GROUP BY doc_id, word
  ) GROUP BY doc_id
)
SELECT w.doc_id, len(w.w) AS n_words,
       len(list_distinct(w.w)) AS n_distinct,
       top.top_word_count,
       1.0 - CAST(len(list_distinct(w.w)) AS DOUBLE) / CAST(len(w.w) AS DOUBLE)
         AS dup_word_frac,
       CAST(top.top_word_count AS DOUBLE) / CAST(len(w.w) AS DOUBLE)
         AS top_word_frac
FROM w JOIN top USING (doc_id)
""",
)
def quality_repetition(spark, sf_dir):
    """X7: Gopher-style repetition quality metrics per document
    (operators/curation.py::repetition_stats)."""
    d = load(spark, sf_dir, "documents")
    return repetition_stats(d).select(
        "doc_id", "n_words", "n_distinct", "top_word_count", "dup_word_frac", "top_word_frac"
    )


@query(
    "dedup_incremental",
    oracle="""
SELECT d.doc_id FROM documents d
WHERE d.doc_id % 5 <> 0
  AND md5(d.text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id % 5 = 0)
""",
)
def dedup_incremental(spark, sf_dir):
    """X7: incremental exact dedup of a new batch against a prior snapshot
    (docs with doc_id % 5 == 0 stand in for the already-processed crawl) —
    one content-hash anti-join, no re-dedup of the old data."""
    d = load(spark, sf_dir, "documents")
    snapshot = d.where(F.col("doc_id") % 5 == 0)
    incoming = d.where(F.col("doc_id") % 5 != 0)
    return dedup_against_snapshot(incoming, snapshot).select("doc_id")


@query(
    "sample_hash_stable",
    oracle="""
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '32'
""",
)
def sample_hash_stable(spark, sf_dir):
    """X7: deterministic hash-based corpus subsample (~19.9%) — selection
    is a pure function of the key, stable across runs/engines/cluster
    sizes, and the predicate pushes down to the scan."""
    d = load(spark, sf_dir, "documents")
    return d.where(stable_sample_pred(F.col("doc_id"))).select("doc_id", "lang")


# ------------------------------------------------------------- temporal (X8)


@query(
    "events_asof_join",
    oracle="""
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, epoch_us(v.ts) AS last_view_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
""",
)
def events_asof_join(spark, sf_dir):
    """X8: as-of join — each purchase gets the same user's latest
    at-or-before view timestamp (operators/temporal.py::asof_join_backward:
    union + single window pass, one shuffle, no inequality join).
    Timestamps surface as epoch micros: DuckDB's TIMESTAMP is
    micro-precision, so the nanos the engine reads are floor-divided to
    match."""
    ev = load(spark, sf_dir, "events")
    us = F.expr("ts div 1000")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("ts_us")
    )
    views = ev.where(F.col("event_type") == "view").select("user_id", us.alias("ts_us"))
    return asof_join_backward(
        purchases, views, key_cols=["user_id"], ts_col="ts_us", out_col="last_view_us"
    )


@query(
    "events_range_join",
    oracle="""
SELECT a.event_id, count(*) - 1 AS n_in_window
FROM (SELECT * FROM events WHERE event_type = 'error') a
JOIN events b
  ON epoch_ns(b.ts) <= epoch_ns(a.ts)
 AND epoch_ns(b.ts) >= epoch_ns(a.ts) - 300000000000
GROUP BY a.event_id
""",
)
def events_range_join(spark, sf_dir):
    """X8: range join — events within the 5 minutes before each error,
    rewritten as a coarse-bucket equi-join + residual filter
    (operators/temporal.py::range_join_count) so the plan shuffles on the
    bucket instead of exploding into an inequality join."""
    ev = load(spark, sf_dir, "events")
    anchors = ev.where(F.col("event_type") == "error")
    return range_join_count(
        anchors, ev, ts_col="ts", window_ns=300_000_000_000, anchor_id="event_id"
    )


@query(
    "funnel_stages",
    oracle="""
WITH t1 AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS v
  FROM events GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(epoch_ns(e.ts)) AS c
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND epoch_ns(e.ts) >= t1.v
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(epoch_ns(e.ts)) AS p
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= t2.c
  GROUP BY e.user_id
)
SELECT CASE WHEN p IS NOT NULL THEN 3
            WHEN c IS NOT NULL THEN 2
            WHEN v IS NOT NULL THEN 1
            ELSE 0 END AS stage,
       count(*) AS n_users
FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
        LEFT JOIN t3 ON t1.user_id = t3.user_id
GROUP BY 1
""",
)
def funnel_stages_q(spark, sf_dir):
    """X8: ordered funnel view → click → purchase; each stage counts only
    at-or-after the user's qualifying previous-stage time. Single window
    exchange per the collapsed-Window plan (operators/temporal.py)."""
    ev = load(spark, sf_dir, "events")
    return funnel_stages(ev, ["view", "click", "purchase"])


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"


@query(
    "pii_scrub",
    oracle=f"""
WITH injected AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN concat(text, ' contact: user', CAST(doc_id AS VARCHAR), '@example.com')
              ELSE text END AS text
  FROM documents
),
scrubbed AS (
  SELECT doc_id, text, regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g') AS clean
  FROM injected
)
SELECT count(*) AS n_docs,
       CAST(SUM(CASE WHEN clean <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_scrubbed,
       CAST(SUM(len(clean) - len(replace(clean, '<EMAIL>', ''))) AS BIGINT) AS redacted_chars,
       CAST(SUM(CASE WHEN contains(clean, '@') THEN 1 ELSE 0 END) AS BIGINT) AS n_residual_at
FROM scrubbed
""",
)
def pii_scrub(spark, sf_dir):
    """X7: PII scrubbing — regexp-redact email addresses (injected into a
    quarter of the corpus), report scrub coverage and residual '@'. Pure
    JVM regexp_replace in whole-stage codegen; the same RE2-safe pattern
    runs in the oracle."""
    d = load(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(" contact: user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clean = F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>")
    scrubbed = injected.select("doc_id", "text", clean.alias("clean"))
    return scrubbed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("clean") != F.col("text")).cast("long")).alias("n_scrubbed"),
        F.sum(
            F.length("clean") - F.length(F.replace(F.col("clean"), F.lit("<EMAIL>"), F.lit("")))
        ).alias("redacted_chars"),
        F.sum(F.col("clean").contains("@").cast("long")).alias("n_residual_at"),
    )


@query(
    "tfidf_top_terms",
    oracle="""
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT lang, term, count(*) AS tf FROM words GROUP BY lang, term
),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM words GROUP BY term
),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.lang, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) * (CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT lang, term, tf, df, score, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rk
  FROM scored
) WHERE rk <= 3
""",
)
def tfidf_top_terms(spark, sf_dir):
    """X7: per-language top TF-IDF terms (rational idf ``N/df`` — a single
    double division, bit-identical across engines, instead of a
    libm-dependent log). Shapes: one explode feeding two
    map-side-combined aggregations ((lang,term) tf and per-term df), a
    broadcast-friendly join on term, and a WindowGroupLimit top-3 per
    language."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    words = d.select("doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("term"))
    tf = words.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = words.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.count()
    scored = tf.join(dfreq, "term").select(
        "lang",
        "term",
        "tf",
        "df",
        (F.col("tf").cast("double") * (F.lit(float(n)) / F.col("df").cast("double"))).alias("score"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), "term")
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3)
