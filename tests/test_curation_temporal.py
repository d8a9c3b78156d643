"""Curation (X7) + temporal (X8) operator semantics and plan shapes.

Value checks use hand-computable micro-fixtures; plan checks assert the
scale-critical property of each operator: the as-of join and range join
never degrade into a nested-loop/cartesian plan.
"""

import pandas as pd
from pyspark.sql import functions as F

from parquetranger_spark.operators.curation import (
    dedup_against_snapshot,
    repetition_stats,
    stable_sample_pred,
)
from parquetranger_spark.operators.temporal import (
    asof_join_backward,
    funnel_stages,
    range_join_count,
)


def test_repetition_stats_values(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["a a a b", "u v w x"],
            }
        )
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1]["n_words"] == 4 and got[1]["n_distinct"] == 2
    assert got[1]["top_word_count"] == 3
    assert got[1]["dup_word_frac"] == 0.5 and got[1]["top_word_frac"] == 0.75
    assert got[2]["dup_word_frac"] == 0.0 and got[2]["top_word_frac"] == 0.25


def test_dedup_against_snapshot(spark):
    seen = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["dup"]}))
    new = spark.createDataFrame(
        pd.DataFrame({"doc_id": [10, 11, 12], "text": ["dup", "fresh", "dup"]})
    )
    out = sorted(r["doc_id"] for r in dedup_against_snapshot(new, seen).collect())
    assert out == [11]


def test_stable_sample_is_deterministic(spark):
    d = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in d.where(stable_sample_pred(F.col("k"))).collect())
    b = sorted(
        r["k"] for r in d.repartition(7).where(stable_sample_pred(F.col("k"))).collect()
    )
    assert a == b and 0 < len(a) < 2000
    # ~19.9% expected at granularity 1/256
    assert abs(len(a) / 2000 - 51 / 256) < 0.05


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": ["u", "u", "v"], "t": [10, 5, 10], "pid": [1, 2, 3]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": ["u", "u", "u"], "t": [5, 7, 11]})
    )
    out = {
        r["pid"]: r["asof_ts"]
        for r in asof_join_backward(left, right, ["k"], "t").collect()
    }
    assert out[1] == 7  # latest at-or-before 10
    assert out[2] == 5  # equal timestamp counts (<= semantics)
    assert out[3] is None  # no right rows for key v


def test_asof_join_plan_has_no_nested_loop(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("t"), F.col("id").alias("pid")
    )
    right = spark.range(50).select((F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("t"))
    plan = asof_join_backward(left, right, ["k"], "t")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the whole join is one union + one window — no join node at all
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "Window" in plan


def test_range_join_count_values(spark):
    # anchors at t=100 and t=500 (window 50): neighbors of 100 are {60, 99,
    # 100(self), 150? no}, so n=2; anchor 500 has only itself → 0
    events = spark.createDataFrame(
        pd.DataFrame({"t": [60, 99, 100, 150, 500], "eid": [0, 1, 2, 3, 4]})
    )
    anchors = events.where(F.col("eid").isin([2, 4]))
    out = {
        r["eid"]: r["n_in_window"]
        for r in range_join_count(anchors, events, "t", 50, "eid").collect()
    }
    assert out == {2: 2, 4: 0}


def test_range_join_plan_is_equi_join(spark):
    events = spark.range(1000).select(F.col("id").alias("t"), F.col("id").alias("eid"))
    anchors = events.where(F.col("eid") % 10 == 0)
    plan = (
        range_join_count(anchors, events, "t", 50, "eid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_funnel_stage_ordering(spark):
    # u1 completes in order; u2 clicks BEFORE its first view (click must not
    # count); u3 views only; u4 has no funnel events at all
    rows = [
        ("u1", "view", 1), ("u1", "click", 2), ("u1", "purchase", 3),
        ("u2", "click", 1), ("u2", "view", 2), ("u2", "purchase", 3),
        ("u3", "view", 5),
        ("u4", "error", 1),
    ]
    ev = spark.createDataFrame(rows, "user_id string, event_type string, ts long")
    out = {
        r["stage"]: r["n_users"]
        for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    # u2 reaches stage 1 only (its click precedes its first view)
    assert out == {3: 1, 1: 2, 0: 1}


def test_topk_per_group_pushes_group_limit(spark, sf_dir):
    """topk_per_group must plan as Partial+Final WindowGroupLimit: the
    per-group top-k is applied map-side BEFORE the shuffle, so the
    exchange carries <= k rows per group per map partition."""
    import __spark_entry__ as m

    plan = (
        m.queries()["topk_per_group"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final


def test_asof_forward_ties_and_tolerance(spark):
    """Forward as-of: equal timestamps match (>= semantics); the nearest
    following right row wins; tolerance nulls out matches too far ahead."""
    from parquetranger_spark.operators.temporal import asof_join_forward

    left = spark.createDataFrame(
        [(1, 100), (1, 250), (2, 100), (3, 500)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 100), (1, 300), (2, 90), (2, 1000), (3, 400)], "k long, ts long"
    )
    out = asof_join_forward(left, right, ["k"], "ts", "nxt", tolerance=200)
    got = {(r.k, r.ts): r.nxt for r in out.collect()}
    assert got == {
        (1, 100): 100,   # exact tie matches
        (1, 250): 300,   # nearest following
        (2, 100): None,  # 1000 is beyond tolerance 200
        (3, 500): None,  # no following right row at all
    }


def test_scd2_apply_all_branches(spark):
    """SCD2: history passes through untouched; identical attrs are a
    no-op; a changed attr closes the open row at the change ts and
    reopens; unseen keys insert; duplicate batch keys keep latest ts."""
    from parquetranger_spark.operators.temporal import scd2_apply

    dim = spark.createDataFrame(
        [
            # key 1: one history row + open row (attr "a")
            (1, "old", 0, 50, False),
            (1, "a", 50, None, True),
            # key 2: open row, will receive an identical-attr change
            (2, "b", 0, None, True),
            # key 3: open row, no change at all
            (3, "c", 0, None, True),
        ],
        "k long, attr string, valid_from long, valid_to long, is_current boolean",
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 100),  # superseded duplicate (older ts)
            (1, "a3", 200),  # wins: key 1 closes at 200, reopens as a3
            (2, "b", 150),   # identical attr -> no-op
            (9, "new", 300), # unseen key -> insert
        ],
        "k long, attr string, ts long",
    )
    out = scd2_apply(dim, changes, ["k"], ["attr"], ts_col="ts")
    got = {tuple(r) for r in out.collect()}
    assert got == {
        (1, "old", 0, 50, False),    # history untouched
        (1, "a", 50, 200, False),    # closed at the winning change ts
        (1, "a3", 200, None, True),  # reopened with the latest attr
        (2, "b", 0, None, True),     # no-op: no empty version created
        (3, "c", 0, None, True),     # unchanged key kept
        (9, "new", 300, None, True), # insert
    }
