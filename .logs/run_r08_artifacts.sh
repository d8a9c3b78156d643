#!/bin/bash
# Serialized round-8 artifact chain (one Spark workload at a time)
cd /root/repo
L=/root/repo/.logs
echo "=== pytest $(date) ===" 
python -m pytest tests/ -q > $L/pytest_r08.log 2>&1
echo "pytest rc=$? $(date)"
echo "=== gate sf0.01 $(date) ==="
python tools/compare.py --json GATE_r08.json > $L/gate_r08.log 2>&1
echo "gate rc=$? $(date)"
echo "=== gate sf0.1 $(date) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/compare.py --json GATE_SF01_r08.json > $L/gate_sf01_r08.log 2>&1
echo "gate-sf01 rc=$? $(date)"
echo "=== scale probe $(date) ==="
python tools/scale_probe.py > SCALE_PROBE_r08.json 2> $L/scale_probe_r08.log
echo "probe rc=$? $(date)"
echo "ALL DONE $(date)"
