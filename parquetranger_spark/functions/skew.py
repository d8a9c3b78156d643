"""Skew-resistant aggregation: explicit two-stage salted group-by.

AQE's skew handling splits oversized *join* partitions, but a groupBy on a
heavily skewed key still funnels every row of a hot key through one
reducer. Salting splits each group into ``n_salts`` subgroups (random-ish
but deterministic salt from a row hash), partially aggregates per
(key, salt), then merges the partials — the hot key's work spreads over
``n_salts`` reducers and the second stage touches only ``groups × salts``
rows.

Only algebraic aggregates decompose this way; the supported set is
``sum``/``count``/``min``/``max``/``avg`` (avg via sum+count re-division).
Results are bit-identical to the unsalted groupBy for exact types; double
sums may differ in rounding order (same caveat as any parallel sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__pqr_salt"

_MERGE = {
    "sum": F.sum,
    "count": lambda c: F.sum(c),  # partial counts merge by summing
    "min": F.min,
    "max": F.max,
}


def _with_salt(df: DataFrame, n_salts: int, salt_mode: str) -> DataFrame:
    """Attach the salt column under one of three explicit trade-offs.

    ``position`` (default): salt from (partition id, row index) — spreads
    even a hot key made of IDENTICAL rows (the duplicate-heavy shape skew
    remedies exist for). CAVEAT, honestly: the row index is not stable
    across stage retries when the upstream is a shuffle (row arrival
    order is nondeterministic), so a fetch-failure recompute can assign
    rows different salts than the attempt whose partial aggregates
    already landed — the classic nondeterministic-partitioning hazard.
    Spark's indeterminate-stage rollback re-runs the WHOLE stage on such
    a failure, which restores correctness for the supported algebraic
    merges; when reading files directly (deterministic scan order) the
    salt is stable anyway.

    ``content``: salt = xxhash64 of every column — fully deterministic
    under any retry, but fully-identical duplicate rows share one salt
    (no mitigation for that one shape).

    ``checkpoint``: position salt, then an EAGER localCheckpoint pins the
    salted rows against any recompute — exactness under task retry at
    the cost of materializing the input once.
    """
    if salt_mode == "content":
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
        return df.withColumn(_SALT, salt)
    if salt_mode not in ("position", "checkpoint"):
        raise ValueError(f"salt_mode must be position|content|checkpoint: {salt_mode!r}")
    out = df.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(n_salts),
        ),
    )
    return out.localCheckpoint(eager=True) if salt_mode == "checkpoint" else out


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_mode: str = "position",
) -> DataFrame:
    """``df.groupBy(keys).agg(...)`` with a salt-split first stage.

    ``aggs`` maps output alias → (function, column) with function in
    {sum, count, min, max, avg}, e.g. ``{"n": ("count", "*"),
    "total": ("sum", "v"), "m": ("avg", "v")}``. See :func:`_with_salt`
    for the ``salt_mode`` determinism trade-offs.
    """
    bad = {f for f, _ in aggs.values()} - {"sum", "count", "min", "max", "avg"}
    if bad:
        raise ValueError(f"non-decomposable aggregate(s): {sorted(bad)}")

    salted = _with_salt(df, n_salts, salt_mode)

    partial_exprs: list[Column] = []
    needed: dict[str, tuple[str, str]] = {}
    for alias, (fn, col) in aggs.items():
        if fn == "avg":
            needed[f"{alias}!s"] = ("sum", col)
            needed[f"{alias}!c"] = ("count", col)
        else:
            needed[alias] = (fn, col)
    for alias, (fn, col) in needed.items():
        c = F.lit(1) if col == "*" else F.col(col)
        partial_exprs.append((F.count(c) if fn == "count" else getattr(F, fn)(c)).alias(alias))

    partials = salted.groupBy(*keys, _SALT).agg(*partial_exprs)

    merge_exprs = [_MERGE[fn](alias).alias(alias) for alias, (fn, _) in needed.items()]
    merged = partials.groupBy(*keys).agg(*merge_exprs)

    out_cols: list[Column] = [F.col(k) for k in keys]
    for alias, (fn, _) in aggs.items():
        if fn == "avg":
            out_cols.append((F.col(f"{alias}!s") / F.col(f"{alias}!c")).alias(alias))
        else:
            out_cols.append(F.col(alias))
    return merged.select(*out_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_mode: str = "position",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (skewed) left side, replicate the
    right side ``n_salts``× so every (key, salt) pair finds its match.

    Use when the hot key's partition would not fit one reducer and the
    right side is too big to broadcast but small enough to replicate
    ``n_salts`` times. With AQE on, prefer letting the runtime split skewed
    partitions (spark.sql.adaptive.skewJoin.enabled); this helper is the
    explicit fallback for engines/paths AQE doesn't cover (e.g. streaming
    joins, or deliberate pre-partitioning).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"unsupported join type for salting: {how}")
    lsalt = _with_salt(left, n_salts, salt_mode)
    rsalt = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return lsalt.join(rsalt, on + [_SALT], how).drop(_SALT)
