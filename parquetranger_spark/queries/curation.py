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
from .common import load, md5_mod_sql

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


@query(
    "stratified_sample",
    oracle="""
SELECT lang, count(*) AS n_kept FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <=
      CASE WHEN lang = 'en' THEN '19' ELSE '7f' END
GROUP BY lang
""",
)
def stratified_sample(spark, sf_dir):
    """X7: stratified deterministic sampling — the over-represented
    language ('en') keeps ~10% (hex prefix ≤ '19' = 26/256) while the
    rest keep 50% ('7f' = 128/256), rebalancing the corpus in one
    scan-level predicate (operators/curation.py::stratified_sample_pred).
    Selection is a pure function of doc_id, so the subsample is identical
    across engines, runs, and cluster layouts."""
    from ..operators.curation import stratified_sample_pred

    d = load(spark, sf_dir, "documents")
    pred = stratified_sample_pred(
        F.col("doc_id"), F.col("lang"), {"en": "19"}, default_hex_max="7f"
    )
    return d.where(pred).groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


# 32/24 chunk layout over documents — shared by the batch query and its
# stateless streaming twin (identical output ⇒ identical oracle)
_CHUNK_ORACLE = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
),
s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
c AS (
  SELECT doc_id, u.s AS start_tok, toks, n
  FROM s, UNNEST(generate_series(CAST(0 AS BIGINT), n - 1, CAST(24 AS BIGINT))) AS u(s)
)
SELECT doc_id, start_tok // 24 AS chunk_idx,
       LEAST(CAST(32 AS BIGINT), n - start_tok) AS n_tokens,
       md5(array_to_string(list_slice(toks, start_tok + 1, start_tok + 32), ' ')) AS chunk_hash
FROM c
"""


@query(
    "doc_chunks",
    oracle=_CHUNK_ORACLE,
)
def doc_chunks(spark, sf_dir):
    """X7: fixed-size token chunking with overlap (32-token chunks every
    24 tokens) — the pass that turns documents into embedding / training
    context windows (operators/packing.py::chunk_documents). Whole plan is
    split → sequence → posexplode → slice inside one codegen stage: zero
    shuffle, zero Python. Chunk text surfaces as md5 so the value-exact
    compare stays compact."""
    from ..operators.packing import chunk_documents

    d = load(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_size=32, stride=24)


@query(
    "docs_pack_bins",
    oracle=r"""
WITH d AS (
  SELECT doc_id, doc_id % 8 AS shard,
         len(string_split_regex(text, '\s+')) AS n_toks
  FROM documents
),
c AS (
  SELECT shard, doc_id, n_toks,
         SUM(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks
           AS cum_before
  FROM d
)
SELECT shard, cum_before // 512 AS bin_id, count(*) AS n_docs, SUM(n_toks) AS total_tokens
FROM c GROUP BY shard, bin_id
""",
)
def docs_pack_bins(spark, sf_dir):
    """X7: offset-based sequence packing — documents laid end-to-end per
    shard in doc_id order, binned into 512-token context budgets
    (operators/packing.py::pack_by_offset), summarized per (shard, bin).
    One shard-local window pass; shards bound the sort so the pack
    parallelizes at any corpus size instead of needing a global order."""
    from ..operators.packing import pack_by_offset

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("n_tokens")
    )
    packed = pack_by_offset(toks, capacity=512, n_shards=8)
    return packed.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("total_tokens")
    )


@query(
    "top_bigrams",
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 2),
b AS (
  SELECT array_to_string(list_slice(toks, u.g, u.g + 1), ' ') AS bigram
  FROM s, UNNEST(generate_series(CAST(1 AS BIGINT), n - 1)) AS u(g)
)
SELECT bigram, count(*) AS n FROM b GROUP BY bigram
ORDER BY n DESC, bigram LIMIT 20
""",
)
def top_bigrams(spark, sf_dir):
    """X4/X7: corpus-level top-20 bigrams — the n-gram statistic that
    surfaces boilerplate and benchmark contamination. Bigrams are built
    in-place from the token array (transform over an index sequence —
    no self-join of exploded tokens, which would shuffle the corpus
    against itself), then one map-side-combined count and a
    TakeOrderedAndProject top-k (per-partition top-20, never a global
    sort)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select(toks.alias("__t"), F.size(toks).alias("__n")).where(F.col("__n") >= 2)
    bigrams = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("__n") - 1),
                lambda i: F.concat_ws(" ", F.col("__t")[i - 1], F.col("__t")[i]),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@query(
    "word_commonness_score",
    oracle=r"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
freq AS (SELECT word, count(*) AS c FROM w GROUP BY word)
SELECT w.doc_id, count(*) AS n_words,
       SUM(freq.c) AS sum_freq,
       CAST(SUM(freq.c) AS DOUBLE) / count(*) AS commonness
FROM w JOIN freq USING (word)
GROUP BY w.doc_id
""",
)
def word_commonness_score(spark, sf_dir):
    """X7: unigram-LM-style quality signal — each document scored by the
    average corpus frequency of its words (fluent text reuses the
    corpus's common vocabulary; gibberish and boilerplate-with-rare-
    tokens score low). Two-pass shape: one map-side-combined vocabulary
    count, then token→frequency equi-join re-aggregated per document.
    The score stays integer-exact until one final double division, so
    it hash-matches across engines — the log-prob variant would differ
    in the last ulp of libm."""
    d = load(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    return (
        words.join(freq, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("c").alias("sum_freq"),
            (F.sum("c").cast("double") / F.count(F.lit(1))).alias("commonness"),
        )
    )


@query(
    "bigram_fluency_score",
    oracle=r"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 2),
bg AS (
  SELECT doc_id, toks[u.g] AS prefix,
         toks[u.g] || ' ' || toks[u.g + 1] AS bigram
  FROM s, UNNEST(generate_series(CAST(1 AS BIGINT), n - 1)) AS u(g)
),
bgf AS (SELECT bigram, count(*) AS c_bg FROM bg GROUP BY bigram),
pref AS (SELECT prefix, count(*) AS c_pref FROM bg GROUP BY prefix)
SELECT bg.doc_id, count(*) AS n_bigrams,
       SUM(bgf.c_bg) AS sum_bg,
       SUM(pref.c_pref) AS sum_prefix,
       CAST(SUM(bgf.c_bg) AS DOUBLE) / CAST(SUM(pref.c_pref) AS DOUBLE)
         AS fluency
FROM bg JOIN bgf USING (bigram) JOIN pref USING (prefix)
GROUP BY bg.doc_id
""",
)
def bigram_fluency_score(spark, sf_dir):
    """X7: Markov-bigram fluency signal — each document scored by a
    pooled conditional bigram probability: sum over its bigrams of the
    corpus bigram count, divided by the sum of the corpus prefix-word
    counts (how often each bigram's first word starts ANY bigram).
    Fluent text chains transitions the corpus itself makes often;
    word-salad built from common words scores low where the unigram
    commonness signal (word_commonness_score) cannot tell the
    difference. Same exactness recipe: integer-exact sums, one final
    double division — the per-bigram log-prob average would diverge in
    libm's last ulp across engines.

    Scale shape: bigrams are built in place from the token array (no
    exploded-token self-join), the two model tables are map-side-
    combined counts, and scoring is two equi-joins re-aggregated per
    doc_id — every shuffle carries bounded word/bigram keys. At 100 TB
    the model tables stay corpus-vocabulary-sized (Zipf-bounded), far
    smaller than the corpus itself."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select(
        "doc_id", toks.alias("__t"), F.size(toks).alias("__n")
    ).where(F.col("__n") >= 2)
    bg = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("__n") - 1),
                lambda i: F.struct(
                    F.col("__t")[i - 1].alias("prefix"),
                    F.concat_ws(
                        " ", F.col("__t")[i - 1], F.col("__t")[i]
                    ).alias("bigram"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.prefix", "p.bigram")
    bgf = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_bg"))
    pref = bg.groupBy("prefix").agg(F.count(F.lit(1)).alias("c_pref"))
    return (
        bg.join(bgf, "bigram")
        .join(pref, "prefix")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("c_bg").alias("sum_bg"),
            F.sum("c_pref").alias("sum_prefix"),
            (F.sum("c_bg").cast("double") / F.sum("c_pref").cast("double")).alias(
                "fluency"
            ),
        )
    )


def _ngram_md5s(n: int):
    """Spark: md5 of each space-joined n-token window of column __t."""
    return F.transform(
        F.sequence(F.lit(1), F.size(F.col("__t")) - (n - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("__t"), i, n))),
    )


@query(
    "shared_ngram_spans",
    oracle=r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 11 = 0
),
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 8),
ngrams AS (
  SELECT doc_id, md5(array_to_string(list_slice(toks, u.g, u.g + 7), ' ')) AS h
  FROM s, UNNEST(generate_series(CAST(1 AS BIGINT), n - 7)) AS u(g)
),
spans AS (
  SELECT h, count(DISTINCT doc_id) AS n_docs FROM ngrams GROUP BY h
)
SELECT count(*) AS n_shared_spans, CAST(SUM(n_docs) AS BIGINT) AS total_occurrences
FROM spans WHERE n_docs > 1
""",
)
def shared_ngram_spans(spark, sf_dir):
    """X7: exact-substring overlap detection — 8-token spans appearing in
    more than one document (the Lee-et-al.-style signal for verbatim
    cross-document duplication that near-dup similarity misses). Spans are
    built in place from the token array and md5-narrowed before the
    count, so the shuffle carries 16-byte keys; one map-side-combined
    distinct-count per span."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.where(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    base = corpus.select(
        "doc_id", F.split(F.col("text"), " ").alias("__t")
    ).where(F.size("__t") >= 8)
    ngrams = base.select("doc_id", F.explode(_ngram_md5s(8)).alias("h"))
    spans = ngrams.groupBy("h").agg(F.count_distinct("doc_id").alias("n_docs"))
    return spans.where(F.col("n_docs") > 1).agg(
        F.count(F.lit(1)).alias("n_shared_spans"),
        F.sum("n_docs").alias("total_occurrences"),
    )


@query(
    "decontaminate_ngrams",
    oracle=r"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, lang, toks, len(toks) AS n FROM t WHERE len(toks) >= 8),
ngrams AS (
  SELECT doc_id, lang, md5(array_to_string(list_slice(toks, u.g, u.g + 7), ' ')) AS h
  FROM s, UNNEST(generate_series(CAST(1 AS BIGINT), n - 7)) AS u(g)
),
bench AS (SELECT DISTINCT h FROM ngrams WHERE doc_id % 50 = 0),
flagged AS (
  SELECT DISTINCT c.doc_id FROM ngrams c JOIN bench USING (h)
  WHERE c.doc_id % 50 <> 0
)
SELECT d.lang, count(*) AS n_docs,
       COUNT(CASE WHEN f.doc_id IS NOT NULL THEN 1 END) AS n_flagged
FROM documents d LEFT JOIN flagged f USING (doc_id)
WHERE d.doc_id % 50 <> 0
GROUP BY d.lang
""",
)
def decontaminate_ngrams(spark, sf_dir):
    """X7: benchmark decontamination — flag corpus documents sharing any
    8-token span with a benchmark set (docs with doc_id % 50 == 0 stand
    in for the eval suite). The benchmark n-gram set is small by nature,
    so it broadcasts and the corpus side never shuffles — the plan that
    lets a 100 TB pretraining corpus be decontaminated in one scan.
    Flagged membership resolves via a distinct semi-join; per-language
    flag counts are the audit surface."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    base = d.select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("__t")
    ).where(F.size("__t") >= 8)
    ngrams = base.select("doc_id", F.explode(_ngram_md5s(8)).alias("h"))
    bench = ngrams.where(F.col("doc_id") % 50 == 0).select("h").distinct()
    flagged = (
        ngrams.where(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "h", "left_semi")
        .select("doc_id")
        .distinct()
    )
    corpus = d.where(F.col("doc_id") % 50 != 0).join(
        flagged.withColumn("__f", F.lit(1)), "doc_id", "left"
    )
    return corpus.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.count("__f").alias("n_flagged")
    )


@query(
    "decontaminate_bloom",
    oracle=r"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, lang, toks, len(toks) AS n FROM t WHERE len(toks) >= 6),
ngrams AS (
  SELECT doc_id, lang, md5(array_to_string(list_slice(toks, u.g, u.g + 5), ' ')) AS h
  FROM s, UNNEST(generate_series(CAST(1 AS BIGINT), n - 5)) AS u(g)
),
bench AS (SELECT DISTINCT h FROM ngrams WHERE doc_id % 40 = 0),
flagged AS (
  SELECT DISTINCT c.doc_id FROM ngrams c JOIN bench USING (h)
  WHERE c.doc_id % 40 <> 0
)
SELECT d.lang, count(*) AS n_docs,
       COUNT(CASE WHEN f.doc_id IS NOT NULL THEN 1 END) AS n_flagged
FROM documents d LEFT JOIN flagged f USING (doc_id)
WHERE d.doc_id % 40 <> 0
GROUP BY d.lang
""",
)
def decontaminate_bloom(spark, sf_dir):
    """X7/X13 (round 4): decontamination with a BLOOM prefilter
    (functions/bloom.py) — the variant for when the benchmark n-gram set
    is too large to broadcast as a hash-join table. The bench spans fold
    into a fixed-size bitset (build = one bit_or aggregation whose
    driver collect is bounded by m/64 words, a config constant); the
    corpus side drops non-matching n-grams with a pure-Column k-probe
    INSIDE the scan stage — the pre-shuffle data reduction a 100 TB
    corpus needs. Bloom false positives are then eliminated by the exact
    semi-join on the (much smaller) survivor set, so the flagged result
    is exact — the oracle is the plain n-gram join, no bloom in sight."""
    from ..functions.bloom import bloom_build, bloom_probe

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    base = d.select("doc_id", F.split(F.col("text"), " ").alias("__t")).where(
        F.size("__t") >= 6
    )
    ngrams = base.select("doc_id", F.explode(_ngram_md5s(6)).alias("h"))
    bench = ngrams.where(F.col("doc_id") % 40 == 0).select("h").distinct()
    # m sized to the fixture's bench-span count (~thousands): 2^18 bits
    # keeps the FPR sub-1e-3 while the build collect stays at 32 KiB; at
    # a real 100 TB run m scales with the eval suite, never the corpus
    m_bits = 1 << 18
    bits = bloom_build(bench, "h", m_bits=m_bits)
    candidates = ngrams.where(F.col("doc_id") % 40 != 0).where(
        bloom_probe(bits, F.col("h"), m_bits=m_bits)
    )
    flagged = (
        candidates.join(F.broadcast(bench), "h", "left_semi")
        .select("doc_id")
        .distinct()
    )
    corpus = d.where(F.col("doc_id") % 40 != 0).join(
        flagged.withColumn("__f", F.lit(1)), "doc_id", "left"
    )
    return corpus.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.count("__f").alias("n_flagged")
    )


@query(
    "events_asof_forward",
    oracle="""
SELECT v.event_id, v.user_id, epoch_us(v.ts) AS ts_us,
       (SELECT min(epoch_us(p.ts)) FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
          AND epoch_us(p.ts) >= epoch_us(v.ts)
          AND epoch_us(p.ts) <= epoch_us(v.ts) + 600000000) AS next_purchase_us
FROM events v WHERE v.event_type = 'view'
""",
)
def events_asof_forward(spark, sf_dir):
    """X8: forward as-of join with tolerance — each view gets the same
    user's NEXT purchase timestamp within 10 minutes
    (operators/temporal.py::asof_join_forward: union + one descending
    window, tolerance as residual null-out — one shuffle, no inequality
    join). The oracle's correlated min-subquery states the same
    semantics declaratively."""
    from ..operators.temporal import asof_join_forward

    ev = load(spark, sf_dir, "events")
    us = F.expr("ts div 1000")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", us.alias("ts_us")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", us.alias("ts_us")
    )
    return asof_join_forward(
        views,
        purchases,
        key_cols=["user_id"],
        ts_col="ts_us",
        out_col="next_purchase_us",
        tolerance=600_000_000,
    )


@query(
    "scd2_track_changes",
    oracle=r"""
WITH dim AS (
  SELECT c_custkey AS custkey, c_mktsegment AS segment,
         CAST(0 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
         TRUE AS is_current
  FROM customer
),
raw AS (
  SELECT CASE WHEN o.o_custkey % 7 = 0 THEN o.o_custkey + 1000000
              ELSE o.o_custkey END AS custkey,
         CASE WHEN o.o_custkey % 3 = 0 THEN c.c_mktsegment
              ELSE 'P-' || o.o_orderpriority END AS segment,
         epoch_us(o.o_orderdate) AS ts
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
ch AS (
  SELECT custkey, segment, ts FROM (
    SELECT raw.*, row_number() OVER (
      PARTITION BY custkey ORDER BY ts DESC, segment DESC) AS rn
    FROM raw
  ) WHERE rn = 1
),
matched AS (
  SELECT d.custkey, d.segment AS old_seg, d.valid_from,
         ch.segment AS new_seg, ch.ts
  FROM dim d JOIN ch USING (custkey)
),
kept AS (
  SELECT d.custkey, d.segment, d.valid_from, d.valid_to, d.is_current
  FROM dim d LEFT JOIN ch ON d.custkey = ch.custkey
  WHERE ch.custkey IS NULL OR ch.segment IS NOT DISTINCT FROM d.segment
),
closed AS (
  SELECT custkey, old_seg AS segment, valid_from, ts AS valid_to,
         FALSE AS is_current
  FROM matched WHERE new_seg IS DISTINCT FROM old_seg
),
reopened AS (
  SELECT custkey, new_seg AS segment, ts AS valid_from,
         CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current
  FROM matched WHERE new_seg IS DISTINCT FROM old_seg
),
inserted AS (
  SELECT ch.custkey, ch.segment, ch.ts AS valid_from,
         CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current
  FROM ch LEFT JOIN dim d ON ch.custkey = d.custkey WHERE d.custkey IS NULL
)
SELECT * FROM kept UNION ALL SELECT * FROM closed
UNION ALL SELECT * FROM reopened UNION ALL SELECT * FROM inserted
""",
)
def scd2_track_changes(spark, sf_dir):
    """X8: Slowly-Changing-Dimension Type-2 maintenance
    (operators/temporal.py::scd2_apply) — a customer-segment dimension
    receives one change batch derived from orders (latest order per
    key wins; every 3rd key submits its unchanged segment to exercise
    the no-op path; every 7th key is offset to an unseen id to exercise
    inserts). Changed keys close their open row at the change time and
    reopen; the result is the full versioned dimension.

    Scale shape: one row_number dedup of the batch, ONE full-outer
    equi-join of open rows against the batch, close+reopen as a
    2-element array explode — history rows never enter the join. The
    oracle restates the same semantics as kept/closed/reopened/inserted
    UNION branches."""
    from ..operators.temporal import scd2_apply

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    dim = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    ck = F.col("o_custkey")
    ch = o.join(c, ck == F.col("c_custkey")).select(
        F.when(ck % 7 == 0, ck + 1000000).otherwise(ck).alias("custkey"),
        F.when(ck % 3 == 0, F.col("c_mktsegment"))
        .otherwise(F.concat(F.lit("P-"), F.col("o_orderpriority")))
        .alias("segment"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ts"),
    )
    return scd2_apply(dim, ch, ["custkey"], ["segment"], ts_col="ts")


@query(
    "dedup_soft_weights",
    oracle="""
WITH h AS (SELECT doc_id, lang, md5(text) AS th FROM documents),
c AS (SELECT th, count(*) AS cluster_size FROM h GROUP BY th)
SELECT h.lang, c.cluster_size, count(*) AS n_docs,
       CAST(count(*) AS DOUBLE) / CAST(c.cluster_size AS DOUBLE)
         AS effective_docs
FROM h JOIN c USING (th)
GROUP BY h.lang, c.cluster_size
""",
)
def dedup_soft_weights(spark, sf_dir):
    """X7: soft dedup — instead of dropping duplicates, every document
    is down-weighted by 1/cluster_size of its exact-text cluster (the
    repeated-data reweighting used when duplicates carry signal:
    popular quotes, licenses, boilerplate). Surfaced as the per-
    (lang, cluster_size) histogram with the weighted contribution
    n_docs/cluster_size — summing effective_docs per lang gives the
    effective corpus size. Grouping by cluster size keeps the exactness
    recipe intact: each output value is ONE double division of two
    exact integers (a per-row SUM of 1/n doubles would be
    order-dependent and engine-divergent).

    Scale shape: md5 groupBy (16-byte shuffle keys) + join back + one
    aggregation over (lang, size) — identical cost to exact dedup; the
    output is |langs| x |distinct cluster sizes|, constant-ish."""
    d = load(spark, sf_dir, "documents")
    h = d.select("doc_id", "lang", F.md5("text").alias("th"))
    c = h.groupBy("th").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        h.join(c, "th")
        .groupBy("lang", "cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.count(F.lit(1)).cast("double") / F.col("cluster_size").cast("double")).alias(
                "effective_docs"
            ),
        )
    )


@query(
    "leakage_safe_splits",
    oracle=f"""
WITH b AS (
  SELECT doc_id, source, n_chars,
         {md5_mod_sql("source", 10)} AS bucket
  FROM documents
),
s AS (
  SELECT CASE WHEN bucket < 8 THEN 'train'
              WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
         source, n_chars
  FROM b
)
SELECT split, count(*) AS n_docs,
       count(DISTINCT source) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY split
""",
)
def leakage_safe_splits(spark, sf_dir):
    """X7: GROUP-aware train/val/test split — the split is decided by
    the md5 hash of the SOURCE, not the document, so every document
    from one crawl source lands in the same split (near-duplicates and
    templated pages cluster within sources; a per-doc split leaks them
    across the train/eval boundary — the complement of
    dataset_split_counts, which splits per doc on purpose). Assignment
    is the engine's exact 128-bit md5-mod (functions/hashing.py), so
    membership is reproducible across engines and as the corpus grows.

    Scale shape: pure Column split predicate (no shuffle to assign),
    one aggregation; distinct-source count shuffles source keys only."""
    from ..functions.hashing import md5_mod

    d = load(spark, sf_dir, "documents")
    b = d.withColumn("bucket", md5_mod(F.col("source"), 10))
    s = b.withColumn(
        "split",
        F.when(F.col("bucket") < 8, "train")
        .when(F.col("bucket") == 8, "val")
        .otherwise("test"),
    )
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "source_quality_rollup",
    oracle="""
WITH h AS (
  SELECT doc_id, source, n_chars, md5(text) AS th FROM documents
),
hc AS (SELECT th, count(*) AS n_same FROM h GROUP BY th)
SELECT h.source, count(*) AS n_docs,
       CAST(SUM(CASE WHEN hc.n_same > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_text,
       CAST(SUM(h.n_chars) AS BIGINT) AS total_chars
FROM h JOIN hc USING (th)
GROUP BY h.source
""",
)
def source_quality_rollup(spark, sf_dir):
    """X7: per-source (domain-level) corpus audit — doc counts, how many
    docs share their exact text with another doc anywhere in the corpus,
    and volume. Two-pass shape: one map-side-combined count per content
    hash, joined back on the 16-byte hash, re-aggregated by source — the
    crawl-health rollup that decides which sources to keep at 100 TB."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", F.md5(F.col("text")).alias("th")
    )
    hc = d.groupBy("th").agg(F.count(F.lit(1)).alias("n_same"))
    return (
        d.join(hc, "th")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_same") > 1).cast("long")).alias("n_dup_text"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "e2e_curation_pipeline",
    oracle=r"""
WITH kept AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
docs AS (
  SELECT d.doc_id, d.lang, d.text FROM documents d JOIN kept USING (doc_id)
  WHERE len(string_split(d.text, ' ')) >= 30
    AND substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) <= '7f'
),
s AS (
  SELECT doc_id, lang, string_split_regex(text, '\s+') AS toks,
         len(string_split_regex(text, '\s+')) AS n
  FROM docs
),
c AS (
  SELECT doc_id, lang, LEAST(CAST(32 AS BIGINT), n - u.g) AS n_tokens
  FROM s, UNNEST(generate_series(CAST(0 AS BIGINT), n - 1, CAST(24 AS BIGINT))) AS u(g)
)
SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM c GROUP BY lang
""",
)
def e2e_curation_pipeline(spark, sf_dir):
    """X7/X10 end-to-end composition: exact dedup (keep min id) →
    length-based quality filter → deterministic 50% hash sample →
    32/24-token chunking, rolled up per language. One declarative plan:
    the dedup aggregate, the sample predicate, and the chunk fan-out all
    fuse into a single job with two shuffles (dedup hash, final rollup) —
    proving the curation operators compose without materialization
    between stages."""
    from ..operators.dedup import exact_dedup
    from ..operators.packing import chunk_documents

    d = load(spark, sf_dir, "documents")
    kept = exact_dedup(d).select("doc_id")
    docs = (
        d.join(kept, "doc_id")
        .where(F.size(F.split(F.col("text"), " ")) >= 30)
        .where(stable_sample_pred(F.col("doc_id"), "7f"))
    )
    chunks = chunk_documents(docs, chunk_size=32, stride=24)
    with_lang = chunks.join(d.select("doc_id", "lang"), "doc_id")
    return with_lang.groupBy("lang").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@query(
    "stream_doc_chunks",
    oracle=_CHUNK_ORACLE,
)
def stream_doc_chunks(spark, sf_dir):
    """X10 streaming twin: chunk_documents applied UNCHANGED to a file
    stream — the operator is a pure stateless projection, so the same
    Column pipeline runs per micro-batch with no state store and no
    watermark, and the appended output equals the batch answer (same
    oracle as doc_chunks). This is the property that lets the curation
    tier run on a live crawl feed."""
    import uuid

    from ..operators.packing import chunk_documents
    from .common import scratch_dir

    root = scratch_dir("schunk")
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    d.write.mode("overwrite").parquet(f"{root}/src")
    stream = spark.readStream.schema("doc_id long, text string").parquet(f"{root}/src")
    chunks = chunk_documents(stream, chunk_size=32, stride=24)
    name = f"schunk_{uuid.uuid4().hex[:8]}"
    q = (
        chunks.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.table(name)


@query(
    "domain_mixture_resample",
    oracle="""
WITH counts AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
rates AS (
  SELECT lang, n_l,
         sqrt(CAST((SELECT min(n_l) FROM counts) AS DOUBLE) / n_l) AS keep_rate
  FROM counts
),
kept AS (
  SELECT d.lang FROM documents d JOIN rates r USING (lang)
  WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        < CAST(floor(r.keep_rate * 4294967296.0) AS BIGINT)
)
SELECT r.lang, r.n_l, r.keep_rate,
       (SELECT count(*) FROM kept k WHERE k.lang = r.lang) AS n_kept
FROM rates r
""",
)
def domain_mixture_resample(spark, sf_dir):
    """X7 (round 4): temperature-based domain rebalancing — the mixture
    pass every multi-source training corpus runs before sampling. Keep
    rate per language is ``sqrt(n_min / n_l)`` (temperature α = 0.5: the
    rarest stratum keeps 100 %, over-represented strata are downsampled
    toward balance), applied as a deterministic md5-threshold predicate —
    selection is a pure function of doc_id, so the mixture is identical
    across engines, runs, and cluster layouts. The rate table is one tiny
    aggregate broadcast back onto the scan: at 100 TB the corpus is read
    once and never shuffled."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    n_min = counts.agg(F.min("n_l").alias("n_min"))
    rates = (
        counts.crossJoin(F.broadcast(n_min))
        .select(
            "lang",
            "n_l",
            F.sqrt(F.col("n_min").cast("double") / F.col("n_l")).alias("keep_rate"),
        )
        .withColumn(
            "thr", F.floor(F.col("keep_rate") * F.lit(4294967296.0)).cast("long")
        )
    )
    from ..functions.hashing import md5_prefix_long

    h32 = md5_prefix_long("doc_id")
    kept = (
        d.join(F.broadcast(rates), "lang")
        .where(h32 < F.col("thr"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "lang", "left_outer")
        .select(
            "lang",
            "n_l",
            "keep_rate",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )


@query(
    "quality_classifier_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
feat AS (
  SELECT doc_id,
         ({md5_mod_sql('tok', 1024)}) * 2654435761 % 1001 - 500 AS w
  FROM toks
),
agg AS (
  SELECT doc_id, CAST(SUM(w) AS BIGINT) AS raw, count(*) AS n_tok
  FROM feat GROUP BY doc_id
)
SELECT doc_id, n_tok, raw,
       0.5 + 0.5 * (CAST(raw AS DOUBLE) / (500.0 * n_tok))
                 / (1.0 + abs(CAST(raw AS DOUBLE) / (500.0 * n_tok))) AS score
FROM agg
""",
)
def quality_classifier_score(spark, sf_dir):
    """X7 (round 4): hashed-bag-of-words linear quality classifier — the
    fastText-style scoring pass (hash each token into one of 1024 feature
    buckets, dot with a weight vector, squash). Weights are a
    deterministic function of the bucket id (a real model would broadcast
    its learned vector; the plumbing — hash, gather, dot, squash — is
    identical), so the score is value-exact cross-engine. Per-token
    weights are INTEGERS summed exactly (a double Σ would be
    order-dependent and unhashable); one final division feeds the
    rational sigmoid x/(1+|x|) (IEEE-identical both engines — exp() is
    libm-dependent and would not be). Entirely JVM Column expressions:
    explode → md5-fold bucket → integer agg; no Python, one shuffle on
    doc_id."""
    from ..functions.hashing import md5_mod

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    w = (md5_mod(F.col("tok"), 1024) * F.lit(2654435761)) % 1001 - 500
    agg = (
        toks.select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(F.sum("w").alias("raw"), F.count(F.lit(1)).alias("n_tok"))
    )
    z = F.col("raw").cast("double") / (F.lit(500.0) * F.col("n_tok"))
    return agg.select(
        "doc_id",
        "n_tok",
        "raw",
        (F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))).alias("score"),
    )


@query(
    "dup_ngram_stats",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 8),
g AS (
  SELECT doc_id, n,
         list_transform(generate_series(0, n - 8),
                        i -> array_to_string(list_slice(toks, i + 1, i + 8), ' ')) AS grams
  FROM s
)
SELECT doc_id, n AS n_tokens,
       len(grams) AS total_8grams,
       len(list_distinct(grams)) AS distinct_8grams,
       1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) AS dup_8gram_frac
FROM g
""",
)
def dup_ngram_stats(spark, sf_dir):
    """X7 (round 4): Gopher's duplicate-n-gram fraction at the 8-gram
    level — the self-repetition signal word-level ``repetition_stats``
    can't see (a doc cycling one paragraph has high 8-gram duplication
    with near-zero word duplication). The whole computation is array expressions
    over the token array inside one codegen stage: sequence → slice →
    array_distinct, zero shuffle, zero Python — per-row cost O(n·8), the
    shape that survives a 100 TB scan."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select("doc_id", toks.alias("__t"), F.size(toks).alias("n")).where(
        F.col("n") >= 8
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.col("n") - 8),
        lambda i: F.array_join(F.slice(F.col("__t"), i + 1, 8), " "),
    )
    g = base.select("doc_id", F.col("n").alias("n_tokens"), grams.alias("__g"))
    total = F.size("__g").cast("long")
    dist = F.size(F.array_distinct("__g")).cast("long")
    return g.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        total.alias("total_8grams"),
        dist.alias("distinct_8grams"),
        (F.lit(1.0) - dist.cast("double") / total.cast("double")).alias("dup_8gram_frac"),
    )


@query(
    "token_budget_sample",
    oracle="""
WITH t AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
c AS (
  SELECT doc_id, n_tok,
         CAST(SUM(n_tok) OVER (ORDER BY n_chars DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tok
  FROM t
)
SELECT doc_id, n_tok, cum_tok
FROM c
WHERE cum_tok <= 0.3 * (SELECT SUM(n_tok) FROM t)
""",
)
def token_budget_sample(spark, sf_dir):
    """X7: global token-budget selection — keep the best documents (here:
    longest-first, doc_id tie-break) until a fixed token budget (30 % of
    the corpus) is exhausted. The oracle states it as a global ordered
    window cumsum; a global sort of 100 TB is exactly what the engine
    must NOT do, so the plan is the two-phase order-statistics pattern:

    1. bucket the priority key into coarse BANDS (n_chars div 16 —
       monotone in the sort key), aggregate tokens per band (map-side
       combined; the band frame is O(distinct bands), i.e. tiny);
    2. a window over that TINY frame yields each band's starting cumsum
       (prefix = tokens in all strictly-better bands);
    3. broadcast the band prefixes back onto the scan; the within-band
       running sum is a window partitioned BY BAND — bounded partitions,
       never a single global sort partition. prefix + within-band cumsum
       equals the global cumsum exactly (integer arithmetic throughout;
       only the final budget compare is one double multiply, identical
       both engines)."""
    from ..operators.curation import budget_select

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    kept = budget_select(
        d, order_col="n_chars", id_col="doc_id", weight_col="n_tok", budget_frac=0.3
    )
    return kept.select("doc_id", "n_tok", F.col("cum_n_tok").alias("cum_tok"))


@query(
    "length_trim_per_lang",
    oracle="""
WITH r AS (
  SELECT doc_id, lang, n_chars,
         rank() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS r,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang, count(*) AS n_kept,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM r
WHERE (r - 1) >= 0.05 * (n - 1) AND (r - 1) <= 0.95 * (n - 1)
GROUP BY lang
""",
)
def length_trim_per_lang(spark, sf_dir):
    """X7: per-language length-percentile trim — drop each language's
    shortest and longest 5 % (percent-rank outside [0.05, 0.95]). The
    oracle ranks with a per-language window; ranking 100 TB per language
    would sort whole-corpus partitions, so the engine derives every
    document's exact rank WITHOUT a corpus-wide sort:

    1. histogram (lang, n_chars) → count (tiny: languages × distinct
       lengths, map-side combined);
    2. a cumsum window over that tiny frame gives each length value's
       END rank; its start rank = end - count + 1;
    3. broadcast the histogram back; a row_number partitioned by
       (lang, n_chars) — tie-width partitions only — offsets each doc
       inside its value group: global rank = start + rn - 1, exactly the
       oracle's rank.

    Both boundary compares are integer-times-double (never a division),
    so the 5 % cut lands on the same documents in both engines."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    hist = d.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("__nv"))
    from pyspark.sql import Window

    hw = Window.partitionBy("lang").orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hist = hist.select(
        "lang",
        "n_chars",
        (F.sum("__nv").over(hw) - F.col("__nv") + 1).alias("__start"),
        F.sum("__nv").over(Window.partitionBy("lang")).alias("__n"),
    )
    tw = Window.partitionBy("lang", "n_chars").orderBy("doc_id")
    ranked = (
        d.join(F.broadcast(hist), ["lang", "n_chars"])
        .withColumn("__r", F.col("__start") + F.row_number().over(tw) - 1)
    )
    kept = ranked.where(
        ((F.col("__r") - 1) >= F.lit(0.05) * (F.col("__n") - 1))
        & ((F.col("__r") - 1) <= F.lit(0.95) * (F.col("__n") - 1))
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "weighted_sample_poisson",
    oracle="""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM documents
),
s AS (SELECT CAST(SUM(w) AS BIGINT) AS tw, CAST(count(*) AS BIGINT) AS n FROM t)
SELECT doc_id, w AS n_tok
FROM t, s
WHERE 5.0 * (CAST(h AS DOUBLE) / 4294967296.0) * CAST(tw AS DOUBLE)
      < CAST(w AS DOUBLE) * CAST(n AS DOUBLE)
""",
)
def weighted_sample_poisson(spark, sf_dir):
    """X7: deterministic weighted (Poisson) sampling — each document kept
    with probability ∝ its token count (expected keep rate 1/5), the
    size-weighted selection a domain-mixture pipeline applies per shard.
    The uniform draw ``u = h / 2³²`` is the md5-prefix integer (the same
    device as sample_hash_stable) scaled by an EXACT power-of-two
    division, and the inclusion test ``5·u·Σw < w·n`` uses no ln/pow and
    no int64 products that could overflow at corpus scale (a pure-integer
    form ``5·h·Σw < 2³²·w·n`` blows past int64 at ~4·10⁸ total tokens —
    doubles never overflow and both engines evaluate the identical IEEE
    expression in the identical order, so membership stays bit-reproducible
    across engines and reruns at any corpus size). One scan + one 1-row
    broadcast aggregate; no shuffle of data rows."""
    from ..functions.hashing import md5_prefix_long

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("w"),
        md5_prefix_long("doc_id").alias("h"),
    )
    s = d.agg(
        F.sum("w").alias("tw"), F.count(F.lit(1)).alias("n")
    )
    u = F.col("h").cast("double") / F.lit(4294967296.0)
    return (
        d.crossJoin(F.broadcast(s))
        .where(
            F.lit(5.0) * u * F.col("tw").cast("double")
            < F.col("w").cast("double") * F.col("n").cast("double")
        )
        .select("doc_id", F.col("w").alias("n_tok"))
    )


@query(
    "snapshot_diff",
    oracle="""
WITH old AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 <> 0
),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN md5(concat(text, ' edited'))
              ELSE md5(text) END AS h
  FROM documents WHERE doc_id % 3 <> 1
)
SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.h <> n.h THEN 'changed' ELSE 'unchanged' END AS status,
       count(*) AS n,
       CAST(SUM(COALESCE(o.doc_id, n.doc_id)) AS BIGINT) AS sum_ids
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
GROUP BY 1
""",
)
def snapshot_diff(spark, sf_dir):
    """X7: dataset snapshot reconciliation — FULL OUTER join of two
    corpus versions on the document key, rows classified added / removed
    / changed / unchanged by content-hash comparison. This is the audit
    every incremental re-crawl wants before promoting a snapshot (how
    much churned?), and the one query shape that needs FULL OUTER
    semantics: both dangling sides survive. Each side is reduced to
    (key, 16-byte hash) BEFORE the join, so the shuffle carries hashes,
    not documents — at 100 TB the join is key-sized."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    old = d.where(F.col("doc_id") % 3 != 0).select(
        "doc_id", F.md5("text").alias("h")
    )
    new = d.where(F.col("doc_id") % 3 != 1).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.md5(F.concat(F.col("text"), F.lit(" edited")))
        )
        .otherwise(F.md5(F.col("text")))
        .alias("h"),
    )
    o = old.alias("o")
    n = new.alias("n")
    j = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
    status = (
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.h") != F.col("n.h"), "changed")
        .otherwise("unchanged")
    )
    return j.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(F.col("o.doc_id"), F.col("n.doc_id"))).alias("sum_ids"),
    )


@query(
    "chunk_dedup_stats",
    oracle=r"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(text, '\s+') AS toks FROM documents
),
s AS (SELECT doc_id, lang, toks, len(toks) AS n FROM t),
c AS (
  SELECT doc_id, lang,
         md5(array_to_string(list_slice(toks, u.s + 1, u.s + 32), ' ')) AS h
  FROM s, UNNEST(generate_series(CAST(0 AS BIGINT), n - 1, CAST(24 AS BIGINT))) AS u(s)
)
SELECT lang, count(*) AS n_chunks,
       count(DISTINCT h) AS n_distinct,
       count(*) - count(DISTINCT h) AS n_dup_chunks
FROM c GROUP BY lang
""",
)
def chunk_dedup_stats(spark, sf_dir):
    """X7/X10 composition: chunk the corpus (the doc_chunks operator) and
    measure chunk-level duplication per language — the pre-training
    question 'how much of my context-window stream is repeated?' answered
    without materializing chunk text: chunks surface as md5 the moment
    they're sliced, so the distinct-count shuffle carries 16-byte hashes.
    One chunking stage (zero shuffle) + one aggregation."""
    from ..operators.packing import chunk_documents

    d = load(spark, sf_dir, "documents")
    ch = chunk_documents(d, chunk_size=32, stride=24, extra_cols=["lang"])
    return ch.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count_distinct("chunk_hash").alias("n_distinct"),
        (F.count(F.lit(1)) - F.count_distinct("chunk_hash")).alias("n_dup_chunks"),
    )


@query(
    "revenue_pareto_front",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
c AS (
  SELECT o_custkey, cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
  FROM per_cust
)
SELECT o_custkey, cents, cum_cents
FROM c
WHERE cum_cents <= 0.5 * (SELECT SUM(cents) FROM per_cust)
""",
)
def revenue_pareto_front(spark, sf_dir):
    """X7 operator reuse on a second domain: the Pareto front — the
    smallest set of customers covering 50 % of revenue — is EXACTLY the
    token-budget selection with revenue as both priority and weight, so
    it reuses operators/curation.py::budget_select unchanged (coarse
    bands → tiny prefix window → within-band windows; never a global
    sort, same answer as the oracle's global cumsum). Revenue is
    integer cents via explicit FLOOR (DuckDB's double→BIGINT cast rounds
    where Spark's truncates — floor pins both) so the
    running totals are exact."""
    from ..operators.curation import budget_select

    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents")
        )
    )
    kept = budget_select(
        per_cust,
        order_col="cents",
        id_col="o_custkey",
        weight_col="cents",
        budget_frac=0.5,
        band_width=100_000,
    )
    return kept.select(
        "o_custkey", "cents", F.col("cum_cents").alias("cum_cents")
    )


@query(
    "per_group_sample",
    oracle="""
WITH r AS (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
SELECT lang, count(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM r WHERE rk <= 7 GROUP BY lang
""",
)
def per_group_sample(spark, sf_dir):
    """X7: EXACT-k per-group sampling — each language contributes its 7
    documents with the smallest content-key hash (md5 hex order, doc_id
    tie-break), the balanced-subset primitive fraction-based sampling
    can't provide (fractions guarantee rates, not counts). Deterministic
    and stable: a new document displaces at most one old member per
    group, never reshuffles the sample. Plans as WindowGroupLimit — the
    rank ≤ k filter pushes below the shuffle, so each map task forwards
    at most k rows per group instead of the whole corpus."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 7)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("sum_ids"))
    )


@query(
    "e2e_release_snapshot",
    oracle=f"""
WITH dedup AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
kept AS (
  SELECT d.doc_id, d.lang, d.source, d.n_chars
  FROM documents d JOIN dedup USING (doc_id)
  WHERE d.n_chars >= 40
),
split AS (
  SELECT *, {md5_mod_sql("source", 10)} AS bucket FROM kept
)
SELECT lang, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM split WHERE bucket < 8
GROUP BY lang
""",
)
def e2e_release_snapshot(spark, sf_dir):
    """X14/S21/S29 integration: the full TRAIN-DATA RELEASE flow in one
    query — exact dedup (keep lowest doc_id per content hash) → length
    floor → leakage-safe train split by md5(source) → WRITE the release
    to a stats-collecting manifest table partitioned by lang → TAG it
    ('release', the durable reproducibility pin vacuum honors) → read
    back THROUGH THE TAG and aggregate. The oracle re-derives the same
    selection relationally, so a fault anywhere in the chain — dedup
    semantics, split hashing, the write path, tag resolution — breaks
    the hash match. The metadata-only count_rows fast path is asserted
    against the tagged read in-query.

    Scale shape: every stage is the already-audited scale form (16-byte
    hash shuffles, pure-Column split, one partitioned write, manifest
    reads); composing them adds no new shuffle."""
    from pyspark.sql import Window

    from ..functions.hashing import md5_mod
    from ..sources.table_repo import TableRepo
    from .common import scratch_dir

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = (
        d.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("n_chars") >= 40))
        .drop("__rn")
    )
    train = dedup.where(md5_mod(F.col("source"), 10) < 8).select(
        "doc_id", "lang", "source", "n_chars"
    )
    t = TableRepo(
        scratch_dir("release") + "/train_docs",
        group_cols="lang",
        index_cols="doc_id",
        commit_mode="manifest",
        stats_cols=["doc_id"],
        spark=spark,
    )
    t.extend(train)
    t.tag("release")
    back = t.get_tagged_df("release")
    if t.count_rows() != back.count():
        raise AssertionError("metadata count_rows disagrees with the tagged read")
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


_PSI_BINS = 10
_PSI_SQL_P = (
    "(CAST({n} AS DOUBLE) + 1.0) / (CAST({tot} AS DOUBLE) + 10.0)"
)


@query(
    "snapshot_drift_psi",
    oracle=f"""
WITH binned AS (
  SELECT least(CAST(floor(CAST(n_chars AS DOUBLE) / 100.0) AS BIGINT), 9) AS bin,
         doc_id % 2 AS snap
  FROM documents
),
counts AS (
  SELECT bin,
         CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
         CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
  FROM binned GROUP BY bin
),
tot AS (
  SELECT bin, n_old, n_new,
         SUM(n_old) OVER () AS tot_old, SUM(n_new) OVER () AS tot_new
  FROM counts
)
SELECT bin, n_old, n_new,
       round((({_PSI_SQL_P.format(n='n_new', tot='tot_new')}) -
              ({_PSI_SQL_P.format(n='n_old', tot='tot_old')})) *
             ln(({_PSI_SQL_P.format(n='n_new', tot='tot_new')}) /
                ({_PSI_SQL_P.format(n='n_old', tot='tot_old')})), 6) AS psi_term
FROM tot
""",
)
def snapshot_drift_psi(spark, sf_dir):
    """X7 pipeline monitoring: population-stability-index drift between
    two corpus snapshots (halves by doc_id parity stand in for
    old/new crawls), over a fixed 10-bin document-length histogram.
    PSI_b = (p_new - p_old) · ln(p_new / p_old) with add-one smoothing
    so empty bins stay finite; bins with |PSI| summing past ~0.2 are the
    classic retrain/investigate trigger.

    Everything except the final per-bin double is exact integers: bin
    counts come from one map-side-combined conditional aggregate (a
    single scan covers both snapshots — no self-join), snapshot totals
    from a window over the 10-row post-aggregation frame. The one
    ln/multiply per bin is written in the identical operand shape in
    both engines and rounded to 6 decimals (the `neardup_pagerank`
    cross-engine convention). Scale: the shuffle carries 10 rows; the
    scan reads two columns."""
    d = load(spark, sf_dir, "documents")
    binned = d.select(
        F.least(
            F.floor(F.col("n_chars").cast("double") / F.lit(100.0)).cast("long"),
            F.lit(9).cast("long"),
        ).alias("bin"),
        (F.col("doc_id") % 2).alias("snap"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0)).alias("n_old"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0)).alias("n_new"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    tot = counts.select(
        "bin",
        "n_old",
        "n_new",
        F.sum("n_old").over(w).alias("tot_old"),
        F.sum("n_new").over(w).alias("tot_new"),
    )

    def _p(n, t):
        return (F.col(n).cast("double") + F.lit(1.0)) / (
            F.col(t).cast("double") + F.lit(10.0)
        )

    p_new, p_old = _p("n_new", "tot_new"), _p("n_old", "tot_old")
    return tot.select(
        "bin",
        "n_old",
        "n_new",
        F.round((p_new - p_old) * F.log(p_new / p_old), 6).alias("psi_term"),
    )


_BANNER = "terms of service apply all rights reserved contact us today"


@query(
    "boilerplate_strip",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 4 = 0 THEN '{_BANNER} ' || text ELSE text END AS text
  FROM documents
),
toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM corpus),
segs AS (
  SELECT doc_id, lang,
         unnest(list_transform(
           generate_series(1, CAST(ceil(CAST(len(t) AS DOUBLE) / 10.0) AS BIGINT)),
           i -> md5(array_to_string(
                  list_slice(t, (i - 1) * 10 + 1, least(i * 10, len(t))), ' '))
         )) AS chunk_hash
  FROM toks
),
boiler AS (
  SELECT chunk_hash FROM segs GROUP BY chunk_hash
  HAVING count(DISTINCT doc_id) >= 3
)
SELECT s.lang, count(*) AS n_segs,
       CAST(SUM(CASE WHEN b.chunk_hash IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       count(DISTINCT s.doc_id) AS n_docs
FROM segs s LEFT JOIN boiler b ON s.chunk_hash = b.chunk_hash
GROUP BY s.lang
""",
)
def boilerplate_strip(spark, sf_dir):
    """X7/X13 corpus-level boilerplate removal (the C4 recipe, segment
    flavor): split every document into consecutive 10-token segments,
    flag any segment appearing in ≥3 DISTINCT documents as boilerplate
    (a deterministic banner is injected onto every 4th doc so the
    fixture actually contains some), and strip flagged segments — the
    per-language audit (segments seen / kept / docs touched) is the
    promotion surface. Near-dedup can't catch this: the banner is a tiny
    fraction of each host document, so pairwise Jaccard stays ~0 while
    the exact same bytes still leak into training millions of times.

    Plan shape at 100 TB: segmentation reuses the X10 chunker
    (split→sequence→posexplode→slice, zero shuffle, whole-stage
    codegen); detection is one groupBy on 16-byte segment hashes with a
    map-side-combined distinct-doc count; application is one equi-join
    of the exploded segments against the (small) flagged set — no
    all-pairs anything, no driver-side state."""
    from ..operators.packing import chunk_documents

    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    corpus = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0, F.concat(F.lit(_BANNER + " "), F.col("text"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )
    segs = chunk_documents(corpus, chunk_size=10, stride=10, extra_cols=["lang"])
    boiler = (
        segs.groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 3)
        .select("chunk_hash")
    )
    flagged = segs.join(
        boiler.withColumn("__b", F.lit(1)), "chunk_hash", "left"
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.when(F.col("__b").isNull(), 1).otherwise(0)).alias("n_kept"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
