"""QUERIES.md is a generated artifact — this test regenerates it from the
runtime query registry and fails on ANY diff, so the documented query
count/inventory can never drift from what the engine actually registers
(round-4 shipped 187 in the doc vs 188 registered; this makes that class
of drift impossible)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_queries_md_matches_registry():
    from gen_query_index import render

    want = render()
    with open(os.path.join(REPO, "QUERIES.md")) as f:
        got = f.read()
    assert got == want, (
        "QUERIES.md is stale vs the runtime query registry — regenerate: "
        "python tools/gen_query_index.py > QUERIES.md"
    )


def test_queries_md_hermetic_to_driver_dropped_samples():
    """Round-8 verdict #3: the driver drops a fresh CORRECTNESS_r{N}.json
    between builder runs; the generated text must derive from the PINNED
    round set only, or this suite fails at every round boundary."""
    from gen_query_index import PINNED_CORRECTNESS_ROUNDS, render

    assert 99 not in PINNED_CORRECTNESS_ROUNDS
    baseline = render()
    extra = os.path.join(REPO, "CORRECTNESS_r99.json")
    assert not os.path.exists(extra)
    try:
        with open(extra, "w") as f:
            f.write('{"some_never_sampled_query": {"match": true}}')
        assert render() == baseline
    finally:
        os.unlink(extra)
