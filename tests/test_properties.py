"""Property-based round-trip tests (hypothesis) — the randomized-data leg
of the reference's test strategy (SURVEY §5: seeded random frames,
tests/test_core.py:283-297, tests/test_parallel.py:19-29). The oracle is
pandas executing the reference semantics on the same frames:

- extend* then full read == concat of inputs (row-set equality);
- replace_records == keep-first-dedup incoming, patch matching keys,
  append the rest (reference core.py:114-133).
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquetranger_spark import TableRepo

KEYS = st.integers(min_value=0, max_value=9)
GROUPS = st.sampled_from(["g1", "g2", "g3"])
VALS = st.one_of(
    st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)
)


@st.composite
def frames(draw, min_rows=1, max_rows=8):
    n = draw(st.integers(min_rows, max_rows))
    return pd.DataFrame(
        {
            "k": [draw(KEYS) for _ in range(n)],
            "g": [draw(GROUPS) for _ in range(n)],
            "v": pd.array([draw(VALS) for _ in range(n)], dtype="float64"),
        }
    )


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf[["k", "g", "v"]]
        .astype({"k": "int64", "g": "string", "v": "float64"})
        .sort_values(["k", "g", "v"], na_position="last")
        .reset_index(drop=True)
    )


def pandas_upsert(old: pd.DataFrame, new: pd.DataFrame, by_groups: bool) -> pd.DataFrame:
    """Reference replace_records semantics in pandas (core.py:114-133)."""
    keys = ["k", "g"] if by_groups else ["k"]
    new = new.loc[~new.duplicated(subset=keys, keep="first")]
    kept = old.merge(new[keys].drop_duplicates(), on=keys, how="left", indicator=True)
    kept = kept[kept["_merge"] == "left_only"].drop(columns="_merge")
    return pd.concat([kept, new], ignore_index=True)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(dfs=st.lists(frames(), min_size=1, max_size=3), grouped=st.booleans())
def test_extend_roundtrip_random(spark, tmp_path_factory, dfs, grouped):
    root = str(tmp_path_factory.mktemp("prop")) + "/t"
    t = TableRepo(root, group_cols="g" if grouped else None, index_cols="k", spark=spark)
    for pdf in dfs:
        t.extend(spark.createDataFrame(pdf))
    got = canon(t.get_full_df().toPandas())
    want = canon(pd.concat(dfs, ignore_index=True))
    pd.testing.assert_frame_equal(got, want)
    t.purge()


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(base=frames(min_rows=2), incoming=frames(), by_groups=st.booleans())
def test_replace_records_random(spark, tmp_path_factory, base, incoming, by_groups):
    root = str(tmp_path_factory.mktemp("prop")) + "/t"
    t = TableRepo(root, group_cols="g", index_cols="k", spark=spark)
    t.extend(spark.createDataFrame(base))
    t.replace_records(spark.createDataFrame(incoming), by_groups=by_groups)
    got = canon(t.get_full_df().toPandas())
    want = canon(pandas_upsert(base, incoming, by_groups))
    pd.testing.assert_frame_equal(got, want)
    t.purge()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 500),  # order key (with ties)
            st.integers(1, 50),  # weight
        ),
        min_size=1,
        max_size=40,
    ),
    frac=st.sampled_from([0.0, 0.25, 0.5, 1.0]),
)
def test_budget_select_matches_global_window(spark, rows, frac):
    """budget_select (band prefix + within-band window) must equal the
    naive global ordered cumsum filter on arbitrary frames — including
    order-key ties, tiny bands, and 0%/100% budgets."""
    import pandas as pd

    from parquetranger_spark.operators.curation import budget_select

    pdf = pd.DataFrame(
        {
            "id": range(len(rows)),
            "o": [r[0] for r in rows],
            "w": [r[1] for r in rows],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r["id"], r["cum_w"])
        for r in budget_select(
            df, order_col="o", id_col="id", weight_col="w", budget_frac=frac
        ).collect()
    }
    s = pdf.sort_values(["o", "id"], ascending=[False, True])
    s["cum"] = s["w"].cumsum()
    budget = frac * pdf["w"].sum()
    want = {(r.id, r.cum) for r in s.itertuples() if r.cum <= budget}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=6), min_size=2, max_size=12
    ),
    max_dist=st.sampled_from([1, 2]),
)
def test_fuzzy_pairs_match_bruteforce(spark, words, max_dist):
    """fuzzy_pairs (length-band blocking) must equal the brute-force
    O(n²) Levenshtein on arbitrary short strings — bands, adjacency, and
    tie handling included."""
    import pandas as pd

    from parquetranger_spark.operators.dedup import fuzzy_pairs

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    pdf = pd.DataFrame({"id": range(len(words)), "s": words})
    sdf = spark.createDataFrame(pdf)
    want = {
        (i, j, lev(words[i], words[j]))
        for i in range(len(words))
        for j in range(i + 1, len(words))
        if lev(words[i], words[j]) <= max_dist
    }
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(sdf, "s", "id", max_dist=max_dist).collect()
    }
    assert got == want
    # q-gram prefix-filter channel: same exact recall contract — the
    # 'ab' alphabet makes low-distinct-gram strings common, so the
    # low-gram band fallback is exercised too
    got_q = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(sdf, "s", "id", max_dist=max_dist, qgram=2).collect()
    }
    assert got_q == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    base=st.lists(frames(), min_size=1, max_size=2),
    kill_keys=st.sets(KEYS, max_size=5),
    grouped=st.booleans(),
)
def test_delete_records_random(spark, tmp_path_factory, base, kill_keys, grouped):
    """delete_records equals pandas boolean filtering on random frames —
    grouped and ungrouped, matched and unmatched keys, multi-row keys."""
    root = str(tmp_path_factory.mktemp("del")) + "/t"
    t = TableRepo(root, group_cols="g" if grouped else None, index_cols="k", spark=spark)
    for pdf in base:
        t.extend(spark.createDataFrame(pdf))
    full = pd.concat(base, ignore_index=True)
    if grouped:
        full = full[full.g.notna()]
    keys_df = spark.createDataFrame(
        pd.DataFrame({"k": sorted(kill_keys) or [10**9]})
    )
    t.delete_records(keys_df)
    got = canon(t.get_full_df().toPandas())
    want = canon(full[~full.k.isin(kill_keys)])
    pd.testing.assert_frame_equal(got, want)
    t.purge()


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=-100, max_value=100),
            st.sampled_from(["x", "y", "z"]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    ),
    preds=st.lists(
        st.one_of(
            st.tuples(st.just("A"), st.sampled_from(["==", "<", "<=", ">", ">="]),
                      st.integers(min_value=-100, max_value=100)),
            st.tuples(st.just("A"), st.just("between"),
                      st.integers(min_value=-100, max_value=0),
                      st.integers(min_value=0, max_value=100)),
            st.tuples(st.just("s"), st.just("=="), st.sampled_from(["x", "y", "z", "w"])),
            st.tuples(st.just("s"), st.just("in"),
                      st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=3)),
        ),
        min_size=1,
        max_size=3,
    ),
    n_commits=st.integers(min_value=1, max_value=3),
)
def test_stats_skipping_soundness_random(spark, tmp_path_factory, rows, preds, n_commits):
    """SOUNDNESS of file skipping: for random data sliced into random
    commits and random conjunctive predicates, the stats-pruned read
    returns exactly the rows a plain filtered full scan returns —
    pruning may only ever remove files that provably hold no match."""
    root = str(tmp_path_factory.mktemp("skiprop")) + "/t"
    t = TableRepo(
        root,
        index_cols="k",
        commit_mode="manifest",
        stats_cols=["A", "s"],
        bloom_cols=["A", "s"],
        spark=spark,
    )
    pdf = pd.DataFrame(rows, columns=["k", "A", "s"])
    chunk = max(1, len(pdf) // n_commits)
    for i in range(0, len(pdf), chunk):
        t.extend(spark.createDataFrame(pdf.iloc[i : i + chunk]))
    got = t.get_full_df_skipping(preds).toPandas()
    mask = pd.Series(True, index=pdf.index)
    for p in preds:
        col = pdf[p[0]]
        if p[1] == "between":
            mask &= (col >= p[2]) & (col <= p[3])
        elif p[1] == "in":
            mask &= col.isin(list(p[2]))
        else:
            import operator

            ops = {"==": operator.eq, "<": operator.lt, "<=": operator.le,
                   ">": operator.gt, ">=": operator.ge}
            mask &= ops[p[1]](col, p[2])
    want = pdf[mask]
    assert sorted(map(tuple, got[["k", "A", "s"]].itertuples(index=False))) == sorted(
        map(tuple, want.itertuples(index=False))
    )
    t.purge()


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    ops=st.lists(
        st.tuples(st.sampled_from(["extend", "replace_groups", "replace_all"]),
                  st.integers(min_value=0, max_value=1000)),
        min_size=1,
        max_size=4,
    )
)
def test_change_feed_replay_converges_random(spark, tmp_path_factory, ops):
    """Change-feed ALGEBRA: replaying the v0→latest feed (apply deletes,
    then inserts) over a random op sequence reconstructs exactly the
    current table — and chaining per-version feeds composes to the same
    thing."""
    root = str(tmp_path_factory.mktemp("cdfprop")) + "/t"
    t = TableRepo(root, group_cols="g", index_cols="k", commit_mode="manifest", spark=spark)
    for i, (op, seed) in enumerate(ops):
        pdf = pd.DataFrame(
            {
                "k": [f"k{seed}_{i}_{j}" for j in range(3)],
                "A": [seed + j for j in range(3)],
                "g": [str((seed + j) % 2) for j in range(3)],
            }
        )
        getattr(t, op)(spark.createDataFrame(pdf))
    # stepwise: apply each version's feed (deletes then inserts) to a
    # running replica — the delete legs of overwrites must exactly cancel
    # previously-inserted rows
    versions = [0] + t.versions()
    replica: set = set()
    for lo, hi in zip(versions, versions[1:]):
        feed = t.changes_between(lo, hi).toPandas()
        cols = ["k", "A", "g"]
        dels = set(map(tuple, feed[feed["_change_type"] == "delete"][cols].itertuples(index=False)))
        ins = set(map(tuple, feed[feed["_change_type"] == "insert"][cols].itertuples(index=False)))
        assert dels <= replica, "feed deleted a row the replica never had"
        replica = (replica - dels) | ins
    current = set(map(tuple, t.get_full_df().toPandas()[["k", "A", "g"]].itertuples(index=False)))
    assert replica == current
    # and the one-shot v0→latest feed agrees
    full = t.changes_between(0).toPandas()
    assert full[full["_change_type"] == "delete"].empty
    assert set(map(tuple, full[["k", "A", "g"]].itertuples(index=False))) == current
    t.purge()
