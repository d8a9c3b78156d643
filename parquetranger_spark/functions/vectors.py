"""Vector math over ``array<float>`` embedding columns (SURVEY §2.4 X3).

Everything is JVM-side Column expressions. Floats are widened to double
*before* any arithmetic (float×float is exactly representable in double,
so the only rounding is in the summation), and dot products are sequential
left folds — the exact shape the DuckDB oracle mirrors, making similarity
values bit-identical across engines.

For heavy batched scoring there is also a vectorized numpy path
(:func:`cosine_topk_pandas`) used by the ANN operators where exactness vs
an oracle is not required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (order-stable for the oracle)."""
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two (float) vectors, computed in double."""
    ad, bd = to_double(a), to_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def hyperplane_bits(arr: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane (sign) sketch: bit j = [dot(v, r_j) >= 0].
    Packed into a long — the LSH bucket key for approximate cosine search.
    ``planes`` are deterministic (seeded) driver-side literals."""
    ad = to_double(arr)
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = (dot(ad, p) >= 0).cast("long")
        bucket = bucket + bit * F.lit(1 << j).cast("long")
    return bucket
