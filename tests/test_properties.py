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
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(
            spark.createDataFrame(pdf), "s", "id", max_dist=max_dist
        ).collect()
    }
    want = {
        (i, j, lev(words[i], words[j]))
        for i in range(len(words))
        for j in range(i + 1, len(words))
        if lev(words[i], words[j]) <= max_dist
    }
    assert got == want


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
