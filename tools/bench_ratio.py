"""Common-set ratio between two BENCH_ALL_r*.json artifacts (round-9
verdict #2 done-criterion: BENCH_ALL_r10 vs r8 ≈ 1.0 — r9 is skipped as
contaminated). Compares the like-for-like ``queries_best`` values over
the intersection of query names, reports the total ratio plus the
biggest per-query movers.

Usage: python tools/bench_ratio.py BENCH_ALL_r10.json BENCH_ALL_r08.json
"""

import json
import sys


def main(new_path: str, old_path: str) -> None:
    new, old = json.load(open(new_path)), json.load(open(old_path))
    qn = new.get("queries_best") or new["queries"]
    qo = old.get("queries_best") or old["queries"]
    common = sorted(set(qn) & set(qo))
    tn, to = sum(qn[q] for q in common), sum(qo[q] for q in common)
    movers = sorted(
        ((qn[q] - qo[q], q) for q in common), key=lambda t: -abs(t[0])
    )[:10]
    print(
        json.dumps(
            {
                "common_queries": len(common),
                "new_total_s": round(tn, 1),
                "old_total_s": round(to, 1),
                "ratio": round(tn / to, 3),
                "top_movers_s": {q: round(d, 2) for d, q in movers},
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
