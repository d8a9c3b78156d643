#!/bin/bash
# Round-8 bench chain (run AFTER run_r08_artifacts.sh completes).
# Ordered cheapest-first so cross-round continuity artifacts land even
# if the round's wall clock runs out mid-chain.
cd /root/repo
L=/root/repo/.logs
echo "=== tpch power $(date) ==="
python tools/tpch_power.py 2> $L/tpch_r08.err | tail -1 > TPCH_POWER_r08.json
echo "tpch rc=$? $(date)"
echo "=== sf1 bench $(date) ==="
python tools/sf1_bench.py 2> $L/sf1_r08.err | tail -1 > BENCH_SF1_r08.json
echo "sf1 rc=$? $(date)"
echo "=== bench --all $(date) ==="
python bench.py --all 2> $L/bench_all_r08.err | tail -1 > BENCH_ALL_r08.json
echo "bench-all rc=$? $(date)"
echo "BENCH ALL DONE $(date)"
