#!/bin/bash
cd /root/repo
L=/root/repo/.logs
echo "=== gate sf0.1 remainder $(date) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/compare.py $(cat $L/gate_sf01_rest.txt | tr ',' ' ') --json $L/GATE_SF01_rest.json > $L/gate_sf01_rest.log 2>&1
echo "rest rc=$? $(date)"
python tools/merge_gate_sf01.py
echo "merge rc=$? $(date)"
bash /root/repo/.logs/run_r08_bench.sh
