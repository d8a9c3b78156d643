"""Corpus-curation operators for training-data pipelines.

No reference counterpart (SURVEY §2.4 — the reference has no compute tier
beyond map_partitions); these are the curation passes an LLM-scale corpus
needs before training: repetition-based quality rules in the style of the
Gopher paper's heuristics (Rae et al. 2021, "Scaling Language Models" §A1.1
— duplicate-line / top-n-gram fractions), incremental dedup against a prior
snapshot, and deterministic hash-based sampling.

Scale notes: everything is either a pure Column expression or a
(doc, word)-keyed aggregation with map-side combine; no Python in any hot
path, no driver-side state, no all-pairs joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document word-repetition metrics (Gopher-style quality rules).

    Emits ``n_words``, ``n_distinct``, ``dup_word_frac`` (1 − distinct/total
    — the word-level analogue of Gopher's duplicate-line fraction) and
    ``top_word_frac`` (most-frequent-word share — the 1-gram case of its
    top-n-gram fraction).

    Shape: n_words/n_distinct are array expressions (zero shuffle);
    the top-word count is an explode → count by (doc, word) → max by doc —
    two map-side-combined aggregations keyed by document, so it scales
    linearly and skews only with pathological single-doc word counts.
    """
    from ..functions.text import tokens as _tokens

    words = _tokens(F.col(text_col))
    base = df.select(F.col(id_col), words.alias("__w"))
    stats = base.select(
        id_col,
        F.size("__w").alias("n_words"),
        F.size(F.array_distinct("__w")).alias("n_distinct"),
    )
    top = (
        base.select(id_col, F.explode("__w").alias("__word"))
        .groupBy(id_col, "__word")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("top_word_count"))
    )
    return (
        stats.join(top, id_col)
        .withColumn(
            "dup_word_frac",
            F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_words").cast("double"),
        )
        .withColumn(
            "top_word_frac",
            F.col("top_word_count").cast("double") / F.col("n_words").cast("double"),
        )
    )


def dedup_against_snapshot(
    df: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup: drop documents whose content hash appears
    in a previously-processed snapshot — the shape every recurring corpus
    refresh needs (dedup new crawl N against crawls 1..N−1 without
    re-deduping the old data).

    One anti-join on a 128-bit content hash: the snapshot side is only
    hashes (16 bytes/doc, not text), so at 100 TB the join key set stays
    small enough to shuffle cheaply — and Spark broadcasts it when it fits.
    """
    seen_hashes = seen.select(F.md5(F.col(text_col)).alias("__h")).distinct()
    return (
        df.withColumn("__h", F.md5(F.col(text_col)))
        .join(seen_hashes, "__h", "left_anti")
        .drop("__h")
    )


def stable_sample_pred(expr: Column, hex_prefix_max: str = "32") -> Column:
    """Deterministic hash-sampling predicate: keep rows whose
    ``md5(expr)`` hex prefix sorts ≤ ``hex_prefix_max`` (two hex chars →
    granularity 1/256; '32' ≈ 19.9%). Unlike ``df.sample``, the selection
    is a pure function of the row key — stable across runs, engines,
    partitionings and cluster sizes, which is what reproducible corpus
    subsampling requires. Pure Column expression evaluated inside
    whole-stage codegen right above the scan — no shuffle, no Python."""
    return F.md5(expr.cast("string")).substr(1, 2) <= F.lit(hex_prefix_max)


def stratified_sample_pred(
    key: Column, stratum: Column, hex_max_by_stratum: dict[str, str], default_hex_max: str
) -> Column:
    """Per-stratum deterministic hash sampling: like
    :func:`stable_sample_pred` but the keep-rate varies by stratum (e.g.
    downsample an over-represented language harder). The rate lookup is a
    CASE chain over the stratum column — still a pure Column expression
    with no shuffle and no Python, and still a stable function of the row
    key, so re-running the pipeline (or running it on a different cluster
    layout) selects the identical subsample per stratum."""
    rate = F.lit(default_hex_max)
    for s, hx in sorted(hex_max_by_stratum.items()):
        rate = F.when(stratum == s, F.lit(hx)).otherwise(rate)
    return F.md5(key.cast("string")).substr(1, 2) <= rate


def budget_select(
    df: DataFrame,
    order_col: str,
    id_col: str,
    weight_col: str,
    budget_frac: float,
    band_width: float = 16,
) -> DataFrame:
    """Global ordered budget selection WITHOUT a global sort: keep the
    best rows (``order_col`` descending, ``id_col`` tie-break) until
    ``budget_frac`` of the total ``weight_col`` is exhausted — i.e. the
    global window cumsum ``SUM(w) OVER (ORDER BY order DESC, id)``
    filtered to ``cum <= frac * total``, computed scalably:

    1. bucket ``order_col`` into coarse BANDS (``floor(order /
       band_width)`` — monotone in the sort key; pick ``band_width`` at
       the column's natural scale: fractional widths, e.g. 0.01 for a
       [0, 1] quality score, keep many bands — a width coarser than the
       value range collapses everything into ONE band and the within-
       band window silently becomes the global sort this design avoids),
       aggregate weight per band — map-side combined, the band frame is
       O(distinct bands);
    2. a window over that TINY frame yields each band's prefix (weight
       in all strictly-better bands);
    3. broadcast the prefixes back; the within-band running sum is a
       window partitioned BY BAND — bounded partitions, never one global
       sort partition. prefix + within-band cumsum == the global cumsum
       exactly (integer/decimal arithmetic preserved; only the final
       budget compare multiplies by the double fraction).

    Returns ``df``'s rows that fit the budget plus a ``cum_<weight_col>``
    column holding the exact global running total."""
    from pyspark.sql import Window

    band = F.floor(F.col(order_col) / F.lit(band_width)).cast("long")
    d = df.withColumn("__band", band)
    tot = d.agg(F.sum(weight_col).alias("__tot"))
    bands = d.groupBy("__band").agg(F.sum(weight_col).alias("__band_w"))
    bw = Window.orderBy(F.col("__band").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bands = bands.select(
        "__band", (F.sum("__band_w").over(bw) - F.col("__band_w")).alias("__prefix")
    )
    dw = (
        Window.partitionBy("__band")
        .orderBy(F.col(order_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_col = f"cum_{weight_col}"
    out = (
        d.join(F.broadcast(bands), "__band")
        .withColumn(cum_col, F.col("__prefix") + F.sum(weight_col).over(dw))
        .crossJoin(F.broadcast(tot))
    )
    return out.where(
        F.col(cum_col) <= F.lit(budget_frac) * F.col("__tot")
    ).drop("__band", "__prefix", "__tot")
