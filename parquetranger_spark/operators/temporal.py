"""Temporal join operators over event streams.

No reference counterpart (SURVEY §2.4: the reference has no joins at all);
these are the temporal primitives event/feature pipelines need that Spark
also lacks as built-ins — expressed as compositions of DataFrame ops so
Catalyst/AQE still owns the physical plan:

- **as-of join** (latest right row at-or-before each left row): union +
  one window pass — NOT a range join. One shuffle by key, one sort; no
  candidate blowup, no inequality join anywhere in the plan.
- **range join** (count/aggregate right rows inside a left-anchored time
  window): coarse-bucket equi-join + residual predicate — the standard
  rewrite that turns an O(n·m) inequality join into a shuffle-bounded
  equi-join with a ≤2× candidate factor.

Timestamps are treated as plain int64 (epoch nanos here — the driver
tables store TIMESTAMP(NANOS) which the engine reads as longs; any
monotonic int works).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    out_col: str = "asof_ts",
) -> DataFrame:
    """For every left row, attach the greatest right ``ts_col`` ≤ the left
    row's (same keys) — ASOF JOIN ... ON l.key = r.key AND r.ts <= l.ts.

    Plan shape: tag sides, union, one window (partition by key, order by
    (ts, side-tag)) carrying ``last(right_ts, ignorenulls)`` — right rows
    sort before left rows at equal timestamps, so ties resolve to ≤
    deterministically. Cost is one shuffle on the join keys + one sort,
    independent of how many right rows precede each left row; a naive
    inequality join is O(candidates) and unshuffleable — this is the shape
    that survives 100 TB. Left rows with no prior right row get null.
    """
    l_cols = left.columns
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        *key_cols, F.col(ts_col), F.lit(0).alias("__side")
    ).withColumn("__r_ts", F.col(ts_col))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn(out_col, F.last("__r_ts", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
        .select(*l_cols, out_col)
    )


def range_join_count(
    anchors: DataFrame,
    events: DataFrame,
    ts_col: str,
    window_ns: int,
    anchor_id: str,
    count_col: str = "n_in_window",
) -> DataFrame:
    """Count ``events`` rows whose ts lies in ``[anchor.ts − window_ns,
    anchor.ts]`` for every anchor row (anchor itself excluded — it is
    assumed to also appear in ``events``).

    Plan shape: both sides get a coarse bucket ``ts div window_ns``; each
    anchor probes buckets {b−1, b} (explode of a 2-element array — anchors
    are the small side), the join is a pure equi-join on the bucket, and
    the exact window test runs as a residual filter on the ≤2× candidates.
    Count arrives via map-side-combined aggregation on the anchor id. The
    self-match is subtracted instead of anti-filtered so anchors with no
    neighbors still surface (count 0) without an extra outer join.
    """
    # integer division: double division loses int64 precision at
    # epoch-nanos magnitudes (ulp 256 ns at 1.7e18), which would misplace
    # boundary events into the wrong bucket and silently drop pairs
    b = F.expr(f"{ts_col} div {window_ns}")
    ev = events.select(F.col(ts_col).alias("__e_ts"), b.alias("__e_b"))
    probe = anchors.select(
        F.col(anchor_id), F.col(ts_col).alias("__a_ts"), b.alias("__a_b")
    ).withColumn("__jb", F.explode(F.array(F.col("__a_b") - 1, F.col("__a_b"))))
    joined = probe.join(ev, probe["__jb"] == ev["__e_b"]).where(
        (F.col("__e_ts") <= F.col("__a_ts"))
        & (F.col("__e_ts") >= F.col("__a_ts") - F.lit(window_ns))
    )
    return (
        joined.groupBy(anchor_id)
        .agg((F.count(F.lit(1)) - F.lit(1)).alias(count_col))
    )


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: how far did each user progress through
    ``stages`` (stage k counts only if it happened at-or-after the user's
    qualifying stage k−1 time)?

    One window partitioning by user carries every stage's conditional min
    (adjacent Window nodes over the same partitioning collapse into a
    single exchange+sort), then one distinct + tiny aggregation. Returns
    ``(stage, n_users)`` where stage 0 = never reached stage 1.
    """
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev = None
    for i, st in enumerate(stages, start=1):
        cond = F.col(type_col) == st
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        col = f"__t{i}"
        df = df.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = col
    # stage k is reachable only through stage k−1 (its condition references
    # __t{k−1}), so reached-stage = count of non-null stage times
    stage_expr = sum(
        (F.col(f"__t{i}").isNotNull().cast("int") for i in range(1, len(stages) + 1)),
        F.lit(0),
    )
    per_user = df.select(F.col(user_col), stage_expr.alias("stage")).distinct()
    return per_user.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    out_col: str = "asof_ts",
    tolerance: int | None = None,
) -> DataFrame:
    """For every left row, attach the smallest right ``ts_col`` ≥ the left
    row's (same keys), optionally within ``tolerance`` time units — the
    forward twin of :func:`asof_join_backward` (pandas
    ``merge_asof(direction='forward')``).

    Same one-shuffle shape: union tagged sides, one window ordered
    DESCENDING carrying ``last(right_ts, ignorenulls)`` — right rows sort
    before left rows at equal timestamps (so ≥ ties match), and the
    running last over the descending order is exactly the forward
    minimum. ``tolerance`` applies as a residual null-out, never a join
    predicate. Left rows with no following right row (or none inside the
    tolerance) get null.
    """
    l_cols = left.columns
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        *key_cols, F.col(ts_col), F.lit(0).alias("__side")
    ).withColumn("__r_ts", F.col(ts_col))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn(out_col, F.last("__r_ts", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )
    if tolerance is not None:
        out = out.withColumn(
            out_col,
            F.when(
                F.col(out_col) <= F.col(ts_col) + F.lit(tolerance), F.col(out_col)
            ),
        )
    return out.select(*l_cols, out_col)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current: str = "is_current",
) -> DataFrame:
    """Apply a change batch to a Slowly-Changing-Dimension Type-2 table
    (Kimball SCD2: closed-out history rows + one open row per key — the
    warehouse-dimension shape; no reference counterpart, the reference
    can only overwrite whole rows).

    ``dim`` carries ``key_cols + attr_cols + valid_from + valid_to +
    is_current`` (``valid_to`` NULL on the open row); ``changes`` carries
    ``key_cols + attr_cols + ts_col`` (effective time). Duplicate keys in
    one batch keep the LATEST effective time (ties broken by attr order —
    deterministic). Semantics, per change row:

    - key's open row exists and any attribute differs → the open row is
      closed (``valid_to`` = change ts, ``is_current`` false) and a new
      open row starts at the change ts;
    - attributes identical → no-op (no empty versions);
    - unseen key → inserted as a new open row starting at its ts.

    History rows pass through untouched.

    Scale shape: history is routed around the join with a filter (at
    100 TB the history dwarfs the open set); the open rows meet the
    deduped batch in ONE full-outer equi-join on the key, and the
    close+reopen split is a 2-element array explode — no second join, no
    window over the dimension. One shuffle on the key, O(open + batch).
    """
    seq = F.struct(F.col(ts_col), *[F.col(c) for c in attr_cols]).alias("__seq")
    w = Window.partitionBy(*key_cols).orderBy(F.col("__seq").desc())
    ch = (
        changes.select(*key_cols, *attr_cols, ts_col)
        .withColumn("__seq", seq)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__seq", "__rn")
    )
    hist = dim.where(~F.col(current))
    open_rows = dim.where(F.col(current))

    t = open_rows.alias("tgt")
    s = ch.alias("src")
    cond = None
    for k in key_cols:
        c = F.col(f"tgt.{k}").eqNullSafe(F.col(f"src.{k}"))
        cond = c if cond is None else cond & c
    j = t.join(s, cond, "full_outer")
    tgt_open = F.col(f"tgt.{current}").isNotNull()
    src_new = F.col(f"src.{ts_col}").isNotNull() & ~tgt_open
    differs = None
    for a in attr_cols:
        d = ~F.col(f"tgt.{a}").eqNullSafe(F.col(f"src.{a}"))
        differs = d if differs is None else differs | d
    changed = tgt_open & F.col(f"src.{ts_col}").isNotNull() & differs

    def _row(from_src: bool, vf, vt, cur):
        cols = []
        side = "src" if from_src else "tgt"
        for k in key_cols:
            cols.append(F.coalesce(F.col(f"tgt.{k}"), F.col(f"src.{k}")).alias(k))
        for a in attr_cols:
            cols.append(F.col(f"{side}.{a}").alias(a))
        cols += [vf.alias(valid_from), vt.alias(valid_to), cur.alias(current)]
        return F.struct(*cols)

    kept = _row(False, F.col(f"tgt.{valid_from}"), F.col(f"tgt.{valid_to}"), F.lit(True))
    closed = _row(False, F.col(f"tgt.{valid_from}"), F.col(f"src.{ts_col}"), F.lit(False))
    reopened = _row(True, F.col(f"src.{ts_col}"), F.lit(None).cast("long"), F.lit(True))
    inserted = _row(True, F.col(f"src.{ts_col}"), F.lit(None).cast("long"), F.lit(True))

    out = (
        j.select(
            F.explode(
                F.when(changed, F.array(closed, reopened))
                .when(src_new, F.array(inserted))
                .otherwise(F.array(kept))
            ).alias("__r")
        )
        .select("__r.*")
    )
    return hist.select(*key_cols, *attr_cols, valid_from, valid_to, current).unionByName(out)
