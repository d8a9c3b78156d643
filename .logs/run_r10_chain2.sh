#!/bin/bash
# Round-10 heavy chain, continuation — the first chain (.logs/run_r10_chain.sh)
# completed suite x3 + SOAK_STABILITY_r10 + GATE_r10 before the session
# restarted at ~21:18 UTC. This resumes from step 5, serialized, one Spark
# workload at a time, with refreshed time guards (round end ~03:20 UTC;
# everything must be quiet hours before).
cd /root/repo
L=/root/repo/.logs
P=/tmp/heavy_progress_r10
note(){ echo "$(date -u +%H:%M:%S) $1" | tee -a $P; }

note "bench --all start"
python bench.py --all 2> $L/bench_all_r10.err | tail -1 > BENCH_ALL_r10.json
note "bench_all rc=$?"

note "tpch start"
python tools/tpch_power.py 2> $L/tpch_r10.err | tail -1 > TPCH_POWER_r10.json
note "tpch rc=$?"

note "dark rotation start"
python tools/dark_rotation.py 10 20 > $L/dark_rotation_r10.log 2>&1
note "dark rc=$?"

if [ "$(date -u +%s)" -lt "$(date -u -d '2026-08-17 00:30' +%s)" ]; then
  note "sf1 bench start"
  python tools/sf1_bench.py 2> $L/sf1_r10.err | tail -1 > BENCH_SF1_r10.json
  note "sf1 rc=$?"
else
  note "sf1 bench SKIPPED (time guard)"
fi

if [ "$(date -u +%s)" -lt "$(date -u -d '2026-08-17 01:00' +%s)" ]; then
  note "scale probe start"
  python tools/scale_probe.py > SCALE_PROBE_r10.json 2> $L/scale_probe_r10.err
  note "probe rc=$?"
else
  note "scale probe SKIPPED (time guard)"
fi
note "CHAIN2 ALL DONE"
