"""Property test for the deferred-overwrite read machinery
(manifest.effective_commits / fold_decided_overwrites): against randomly
generated commit chains — appends, dv entries, fenced empties, and
txn-gated overwrites in every decision state — the effective view must
equal a naive model that replays the chain, and folding decided
overwrites must be READ-INVISIBLE (the invariant the publish loop leans
on). Pure python, no Spark session."""

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from parquetranger_spark.sources import manifest as M

SPEC = ["g"]
PARTS = ["A", "B", "C"]


def _marker(tmp, i, state):
    p = os.path.join(tmp, f"txn-{i}.json")
    if state != "pending":
        with open(p, "w") as f:
            json.dump({"state": state}, f)
    # bust the process-wide outcome cache (markers are reused across
    # hypothesis examples)
    M._TXN_CACHE.pop(p, None)
    return p


op_st = st.one_of(
    st.tuples(st.just("append"), st.sampled_from(PARTS), st.booleans()),
    st.tuples(st.just("dv"), st.just(None), st.just(False)),
    st.tuples(st.just("fence"), st.just(None), st.just(False)),
    st.tuples(
        st.just("ow"),
        st.one_of(st.sampled_from(PARTS), st.just("ALL")),
        st.sampled_from(["pending", "committed", "aborted"]),
    ),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(op_st, min_size=0, max_size=12))
def test_effective_matches_model_and_fold_is_read_invisible(tmp_path_factory, ops):
    tmp = str(tmp_path_factory.mktemp("txn"))
    commits = []
    for i, (kind, arg, flag) in enumerate(ops):
        if kind == "append":
            c = {"dir": f"d{i}", "files": [f"g={arg}/f{i}.parquet"]}
            if flag:  # txn-gated append, committed (visible)
                c["txn"] = _marker(tmp, i, "committed")
            commits.append(c)
        elif kind == "dv":
            commits.append(
                {"dir": f"d{i}", "files": [f"k{i}.parquet"], "kind": "dv",
                 "key_cols": ["k"]}
            )
        elif kind == "fence":
            commits.append({"dir": f"d{i}", "files": [], "fence": ["s", str(i)]})
        else:  # txn overwrite
            c = {
                "dir": f"d{i}",
                "files": [] if arg == "ALL" else [f"g={arg}/f{i}.parquet"],
                "txn": _marker(tmp, i, flag),
            }
            c["ow"] = (
                {"scope": "all"}
                if arg == "ALL"
                else {"scope": "groups", "touched": [[arg]], "spec": SPEC}
            )
            commits.append(c)

    def model(cs):
        """Naive replay: visible entries only; each visible ow prunes
        earlier entries per its scope (fences survive as empty)."""
        out = []
        for c in cs:
            m = c.get("txn")
            if m is not None and M.txn_state(m) != "committed":
                continue
            ow = c.get("ow")
            if ow:
                if ow.get("scope") == "all":
                    out = [
                        {**e, "files": []} for e in out if "fence" in e
                    ]
                else:
                    touched = {tuple(t) for t in ow["touched"]}
                    nxt = []
                    for e in out:
                        kept = [
                            f
                            for f in e["files"]
                            if M.partition_values_of(f, SPEC) not in touched
                        ]
                        if kept or "fence" in e:
                            nxt.append({**e, "files": kept})
                    out = nxt
            out.append(c)
        return [(e["dir"], tuple(e["files"]), e.get("kind")) for e in out]

    def view(cs):
        return [
            (e["dir"], tuple(e["files"]), e.get("kind"))
            for e in M.effective_commits(cs, SPEC)
        ]

    assert view(commits) == model(commits)

    # folding decided overwrites must not change the effective view, must
    # leave no decided ow markers behind, and must be idempotent
    folded = M.fold_decided_overwrites([dict(c) for c in commits])
    assert view(folded) == view(commits)
    for c in folded:
        if "ow" in c:
            assert M.txn_state(c["txn"]) != "committed"
    assert M.fold_decided_overwrites([dict(c) for c in folded]) == folded
