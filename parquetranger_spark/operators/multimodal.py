"""Multimodal (binary payload) columns (SURVEY §2.4 X5).

The engine treats image/audio/video as opaque ``binary`` columns with a
typed metadata struct next to them; decode / feature-extract run as
Arrow-batched ``mapInPandas`` so payload bytes never round-trip through
Python row objects. The actual codec layer (PIL / soundfile / av) is not
present in this container — the decode step is STUBBED: if the library is
importable it is used, else a clearly-marked deterministic fake derives
metadata from the payload bytes (md5-seeded), keeping the Spark-side
plumbing — schema, partitioning, batch shape — real and testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "item_id long, byte_len long, content_md5 string, width int, height int, decoder string"
)


def pack_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Wrap a column as an opaque binary payload + metadata — the storage
    shape for multimodal data (the reference already stores raw bytes,
    tests/test_core.py:293)."""
    return df.select(
        F.col(id_col).alias("item_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col)).alias("orig_chars"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: pseudo width/height
    from the content hash. Marked as fake in the output's decoder column."""
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def extract_features(df: DataFrame, payload_col: str = "payload", id_col: str = "item_id") -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas.

    Batches arrive as Arrow buffers (zero-copy for binary); each batch
    yields one metadata frame. Real decoders plug in here — the stub keeps
    the signature and batch shape identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the decoder column must label what PRODUCED the dimensions:
        # this stub always uses the md5 fake (a real PIL decode would
        # plug in here), so advertising 'pil' merely because the library
        # happens to be importable would mark fake dimensions as real
        decoder = "fake-md5"
        for pdf in batches:
            # NULL payloads (pack_binary of NULL text produces them) —
            # bytes(None) would TypeError and fail the whole job on one
            # bad row; skip them like the dedup operators skip null text
            pdf = pdf[pdf[payload_col].notna()]
            payloads = pdf[payload_col]
            dims = [_fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col],
                    "byte_len": [len(bytes(p)) for p in payloads],
                    "content_md5": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "decoder": decoder,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


def embed_binary(
    df: DataFrame, payload_col: str = "payload", id_col: str = "item_id", dim: int = 64
) -> DataFrame:
    """Pseudo-embedding over binary payloads — the CLIP/CLAP-embed slot of
    a multimodal pipeline, same honest stub contract as the decoder: a
    real model plugs into the SAME mapInPandas signature (Arrow batches
    in, ``array<float>`` out); absent one, the vector is derived
    deterministically from the content hash (md5-chained bytes → [-1, 1)
    floats), so identical payloads embed identically and the downstream
    ANN/dedup plumbing is fully exercised and retry-stable."""

    def run(batches):
        import hashlib as _hl

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            # same null-payload guard as extract_features
            pdf = pdf[pdf[payload_col].notna()]
            vecs = []
            for p in pdf[payload_col]:
                raw = b""
                seed = _hl.md5(bytes(p)).digest()
                while len(raw) < dim:
                    seed = _hl.md5(seed).digest()
                    raw += seed
                arr = _np.frombuffer(raw[:dim], dtype=_np.uint8).astype(_np.float32)
                vecs.append((arr / 128.0 - 1.0).tolist())
            yield _pd.DataFrame({"item_id": pdf[id_col], "embedding": vecs})

    return df.select(id_col, payload_col).mapInPandas(
        run, "item_id long, embedding array<float>"
    )


def frame_sample(df: DataFrame, every_n: int = 10, id_col: str = "item_id") -> DataFrame:
    """Deterministic 1-in-n sampling by id hash — the frame-subsampling
    shape for video pipelines (no RNG: retry-stable)."""
    return df.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(every_n)) == 0)


def frame_sample_ordered(
    df: DataFrame,
    every_n: int,
    key_cols: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Every n-th frame PER stream in presentation order (frames 0, n,
    2n, … of each video) — the uniform-stride subsampling video
    pipelines actually want, vs :func:`frame_sample`'s hash thinning
    (which is stream-position-blind). One window per stream key. Pass
    ``tiebreak_cols`` (e.g. the frame id) whenever ``order_col`` can
    repeat within a stream — row_number over a non-total order is
    free to differ between runs and engines."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col), *[F.col(c) for c in (tiebreak_cols or [])]
    )
    return (
        df.withColumn("__fr", F.row_number().over(w))
        .where((F.col("__fr") - 1) % every_n == 0)
        .drop("__fr")
    )


from ..serde import pickle_module_by_value as _pmv  # noqa: E402

_pmv(__name__)
