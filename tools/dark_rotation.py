"""Dark-list rotation (round-9 verdict #6): 129 of 213 registry queries
have never been driver-sampled. The builder cannot pick the driver's
sample, but CAN mechanically exercise a slice of the never-sampled
("dark") queries each round in an independent committed run: this tool
computes dark = registry − union(all CORRECTNESS_r*.json keys), picks
``n`` of them deterministically (seeded by round number, so successive
rounds walk different slices), runs them through tools/compare.py (the
full Spark-vs-DuckDB value gate), and records DARK_ROTATION_r{N}.json.

Usage: python tools/dark_rotation.py <round> [n=20]
"""

from __future__ import annotations

import glob
import json
import os
import random
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def dark_list() -> list[str]:
    import __spark_entry__ as entrymod

    registry = set(entrymod.queries())
    sampled: set = set()
    for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        try:
            sampled |= set(json.load(open(p)))
        except Exception:
            pass
    return sorted(registry - sampled)


def main(rnd: int, n: int = 20) -> None:
    dark = dark_list()
    rng = random.Random(10_000 + rnd)  # deterministic per round
    pick = sorted(rng.sample(dark, min(n, len(dark))))
    print(f"# dark list: {len(dark)} queries; rotating {len(pick)} this round")
    t0 = time.monotonic()
    tmp = os.path.join(ROOT, ".logs", f"dark_rotation_r{rnd:02d}_gate.json")
    os.makedirs(os.path.dirname(tmp), exist_ok=True)
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "compare.py"), *pick, "--json", tmp],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    gate = json.load(open(tmp)) if os.path.exists(tmp) else {}
    out = {
        "round": rnd,
        "dark_total": len(dark),
        "rotated": pick,
        "rc": p.returncode,
        "wall_s": round(time.monotonic() - t0, 1),
        "results": gate,
        "tail": [ln for ln in p.stdout.splitlines() if ln.strip()][-3:],
    }
    dest = os.path.join(ROOT, f"DARK_ROTATION_r{rnd:02d}.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("round", "dark_total", "rc", "wall_s")}))


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 20)
