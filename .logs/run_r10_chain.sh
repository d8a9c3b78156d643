#!/bin/bash
# Round-10 serialized heavy chain — ONE Spark workload at a time, started
# EARLY (round-9 verdict #1/#2: the r9 chain straddled the snapshot and the
# driver's bench died against it; this chain is budgeted to land hours
# before round end, with time guards that SKIP the cheapest-to-lose tail
# items rather than overrun). Priority order:
#   1-3. three consecutive full-suite runs (process soak in-suite) -> SOAK_STABILITY_r10
#   4.   GATE_r10 (full 213-query registry vs DuckDB @ sf0.01)
#   5.   BENCH_ALL_r10 (common-set ratio target vs r8 ~ 1.0)
#   6.   TPCH_POWER_r10
#   7.   DARK_ROTATION_r10 (20 never-driver-sampled queries, independent run)
#   8.   BENCH_SF1_r10   (guard 21:30 UTC)
#   9.   SCALE_PROBE_r10 (guard 22:10 UTC)
cd /root/repo
L=/root/repo/.logs
P=/tmp/heavy_progress_r10
note(){ echo "$(date -u +%H:%M:%S) $1" | tee -a $P; }

for i in 1 2 3; do
  note "suite run$i start"
  t0=$SECONDS
  python -m pytest tests/ -q > $L/suite_r10_run$i.log 2>&1
  rc=$?
  echo "exit=$rc wall=$((SECONDS-t0))s" >> $L/suite_r10_run$i.log
  note "suite run$i rc=$rc wall=$((SECONDS-t0))s"
done
python tools/soak_stability.py 10 >> $P 2>&1

note "gate sf0.01 start"
python tools/compare.py --json GATE_r10.json > $L/gate_r10.log 2>&1
note "gate rc=$?"

note "bench --all start"
python bench.py --all 2> $L/bench_all_r10.err | tail -1 > BENCH_ALL_r10.json
note "bench_all rc=$?"

note "tpch start"
python tools/tpch_power.py 2> $L/tpch_r10.err | tail -1 > TPCH_POWER_r10.json
note "tpch rc=$?"

note "dark rotation start"
python tools/dark_rotation.py 10 20 > $L/dark_rotation_r10.log 2>&1
note "dark rc=$?"

if [ "$(date -u +%s)" -lt "$(date -u -d 21:30 +%s)" ]; then
  note "sf1 bench start"
  python tools/sf1_bench.py 2> $L/sf1_r10.err | tail -1 > BENCH_SF1_r10.json
  note "sf1 rc=$?"
else
  note "sf1 bench SKIPPED (time guard)"
fi

if [ "$(date -u +%s)" -lt "$(date -u -d 22:10 +%s)" ]; then
  note "scale probe start"
  python tools/scale_probe.py > SCALE_PROBE_r10.json 2> $L/scale_probe_r10.err
  note "probe rc=$?"
else
  note "scale probe SKIPPED (time guard)"
fi
note "ALL DONE"
