"""Document chunking and sequence packing for training-data pipelines.

No reference counterpart (SURVEY §2.4 — the reference has no compute tier);
these are the passes that turn a curated corpus into model-ready units:
fixed-size token chunking with overlap (context windows for embedding /
pretraining) and offset-based sequence packing (grouping short documents
into fixed-token-budget bins).

Scale notes: chunking is a pure Column pipeline — split, sequence,
posexplode, slice — that runs inside whole-stage codegen with zero
shuffle (one input row fans out to ceil(n_tokens/stride) output rows in
place). Packing is one window aggregation per shard: the shard key bounds
the sort width, so a 100 TB corpus packs as thousands of independent
shard-local cumulative sums, never a global order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Split each document's whitespace token stream into chunks of
    ``chunk_size`` tokens starting every ``stride`` tokens (overlap =
    ``chunk_size - stride``). Emits one row per (document, chunk) with
    ``chunk_idx`` (0-based), ``n_tokens`` (≤ chunk_size; the final chunk
    may be short) and ``chunk_hash`` (md5 of the rejoined chunk text —
    a compact value-exact surface; callers wanting the text itself can
    select the slice before hashing).

    Plan shape: no shuffle and no Python — the token array is built once
    per row, chunk starts come from ``sequence(0, n-1, stride)``, and
    ``posexplode`` fans rows out inside the same stage.
    """
    extra = list(extra_cols or [])
    toks = F.split(F.col(text_col), r"\s+")
    base = df.select(
        F.col(id_col), *extra, toks.alias("__t"), F.size(toks).cast("long").alias("__n")
    )
    starts = F.sequence(F.lit(0).cast("long"), F.col("__n") - 1, F.lit(stride).cast("long"))
    exploded = base.select(
        id_col, *extra, "__t", "__n", F.posexplode(starts).alias("chunk_idx", "__s")
    )
    chunk = F.slice(F.col("__t"), F.col("__s").cast("int") + 1, F.lit(chunk_size))
    return exploded.select(
        F.col(id_col),
        *extra,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.least(F.lit(chunk_size).cast("long"), F.col("__n") - F.col("__s")).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def pack_by_offset(
    df: DataFrame,
    capacity: int = 512,
    n_shards: int = 8,
    count_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_expr: Column | None = None,
) -> DataFrame:
    """Offset-based sequence packing: within each shard, documents are laid
    end-to-end in ``id_col`` order and assigned to the fixed-capacity bin
    where their first token lands (``bin_id = cum_tokens_before div
    capacity``). Deterministic, engine-independent, and one window pass —
    the shape that packs short documents into training context windows
    without a driver-side loop. Greedy best-fit packs marginally tighter
    but needs sequential state; offset packing loses at most one straddling
    document per bin boundary and stays fully declarative.

    Shards bound the window sort (shard-local order, never global), so the
    pack parallelizes across ``n_shards × partitions`` at any scale.
    Returns one row per document: shard, bin_id, id, token count.
    """
    if shard_expr is None:
        # numeric ids shard by value (deterministic, oracle-friendly);
        # anything else hashes first — a string id through pmod would
        # THROW under ANSI (or null-collapse every row into ONE global
        # window partition with ANSI off, silently voiding the
        # shards-bound-the-sort guarantee)
        from pyspark.sql import types as T

        if isinstance(
            df.schema[id_col].dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        ):
            shard_expr = F.pmod(F.col(id_col), F.lit(n_shards))
        else:
            shard_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    shard = shard_expr.alias("shard")
    base = df.select(shard, F.col(id_col), F.col(count_col).cast("long").alias("n_toks"))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = base.withColumn("__cum_before", F.sum("n_toks").over(w) - F.col("n_toks"))
    return ranked.select(
        "shard",
        F.expr(f"__cum_before div {capacity}").alias("bin_id"),
        id_col,
        "n_toks",
    )


from ..serde import pickle_module_by_value as _pmv  # noqa: E402

_pmv(__name__)
