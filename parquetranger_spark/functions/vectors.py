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


def cosine_prenormed(a_d: Column, b_d: Column, na: Column, nb: Column) -> Column:
    """Cosine with the per-ROW work hoisted: callers project the double
    cast and the norm once per input row BEFORE a join, so each candidate
    pair pays one dot-product fold instead of two casts + two norm folds
    (higher-order functions run interpreted — per-pair recomputation is
    the hot cost in top-k scoring). ``dot/(na*nb)`` performs the same
    double ops in the same order as :func:`cosine`, so results are
    bit-identical."""
    return dot(a_d, b_d) / (na * nb)


def hyperplane_bits(arr: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane (sign) sketch: bit j = [dot(v, r_j) >= 0].
    Packed into a long — the LSH bucket key for approximate cosine search.
    ``planes`` are deterministic (seeded) driver-side literals.

    The plane matrix is bound as ONE all-literal ``array<array<double>>``
    expression — constant-folded by Catalyst into a single Literal — and
    the per-plane dot products are a single ``transform`` + ``aggregate``
    fold. Unrolling a separate dot-product subtree per plane (the naive
    shape) generates ``n_planes × dim`` expression nodes, which at real
    embedding dims (768–3072) × 16 planes blows past whole-stage-codegen
    limits; this shape stays O(1) in the optimized plan regardless of
    dim."""
    ad = to_double(arr)
    # build the literal via ONE parsed SQL string: constructing n_planes×dim
    # F.lit Column objects costs a py4j round-trip per element (~0.6s per
    # call site at 12×64 — dominated ANN query build time); one F.expr
    # parse is ~100× cheaper and yields the identical constant-folded
    # Literal. %.17e round-trips doubles exactly and always carries an
    # exponent, so Spark's parser types every element DOUBLE (bare decimal
    # literals would parse as DECIMAL).
    planes_lit = F.expr(
        "array(" + ",".join("array(" + ",".join(f"{v:.17e}" for v in p) + ")" for p in planes) + ")"
    )
    bits = F.transform(planes_lit, lambda p: (dot(ad, p) >= 0).cast("long"))
    # Horner fold over reversed bits ⇒ Σ bit_j · 2^j, same packing as the
    # per-plane shift-add (bit 0 = first plane)
    return F.aggregate(
        F.reverse(bits),
        F.lit(0).cast("long"),
        lambda acc, b: acc * F.lit(2).cast("long") + b,
    )
