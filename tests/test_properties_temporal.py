"""Property-based tests for the temporal operators: hypothesis-generated
event sets checked against pandas oracles (``pd.merge_asof`` for the
as-of join, a brute-force window count for the range join) — extending
the reference's randomized-frames test strategy (SURVEY §5) to the
round-2 tier."""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquetranger_spark.operators.temporal import asof_join_backward, range_join_count

KEYS = st.sampled_from(["u1", "u2", "u3"])
TS = st.integers(min_value=0, max_value=50)


@st.composite
def event_sets(draw, max_rows=10):
    n = draw(st.integers(1, max_rows))
    # unique (key, ts) pairs: the <=-asof result on ties within one side
    # is ts-deterministic but pandas/spark may pick different equal rows
    pairs = draw(
        st.lists(st.tuples(KEYS, TS), min_size=n, max_size=n, unique=True)
    )
    return pd.DataFrame({"k": [p[0] for p in pairs], "t": [p[1] for p in pairs]})


_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@given(left=event_sets(), right=event_sets())
@_SETTINGS
def test_asof_matches_pandas_merge_asof(spark, left, right):
    left = left.assign(pid=range(len(left)))
    got = {
        r["pid"]: r["asof_ts"]
        for r in asof_join_backward(
            spark.createDataFrame(left), spark.createDataFrame(right), ["k"], "t"
        ).collect()
    }
    want_df = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t").rename(columns={"t": "rt"}),
        left_on="t",
        right_on="rt",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    want = dict(zip(want_df["pid"], want_df["rt"]))
    for pid, w in want.items():
        g = got[pid]
        assert (pd.isna(w) and g is None) or g == w, (pid, g, w)


@given(events=event_sets(max_rows=12), window=st.integers(1, 20))
@_SETTINGS
def test_range_join_matches_bruteforce(spark, events, window):
    events = events.assign(eid=range(len(events)))
    anchors = events[events["eid"] % 2 == 0]
    if anchors.empty:
        return
    got = {
        r["eid"]: r["n_in_window"]
        for r in range_join_count(
            spark.createDataFrame(anchors),
            spark.createDataFrame(events),
            "t",
            window,
            "eid",
        ).collect()
    }
    for _, a in anchors.iterrows():
        n = int(
            ((events["t"] <= a["t"]) & (events["t"] >= a["t"] - window)).sum()
        ) - 1  # minus the anchor's own row
        assert got[a["eid"]] == n, (a["eid"], got[a["eid"]], n)


@given(left=event_sets(), right=event_sets(), tol=st.one_of(st.none(), st.integers(0, 30)))
@_SETTINGS
def test_asof_forward_matches_pandas_merge_asof(spark, left, right, tol):
    from parquetranger_spark.operators.temporal import asof_join_forward

    left = left.assign(pid=range(len(left)))
    got = {
        r["pid"]: r["nxt"]
        for r in asof_join_forward(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            ["k"],
            "t",
            out_col="nxt",
            tolerance=tol,
        ).collect()
    }
    want_df = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t").rename(columns={"t": "rt"}),
        left_on="t",
        right_on="rt",
        by="k",
        direction="forward",
        tolerance=tol,
    )
    want = {
        row.pid: (None if pd.isna(row.rt) else int(row.rt))
        for row in want_df.itertuples()
    }
    assert got == want
