#!/bin/bash
# Round-4 chain 6: 1M x 128 deg-128 graph retry (2-D lane-aligned packs
# + per-chunk kNN-build sync now in), then a final healthy bench capture.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r4_chain6
step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  sleep 20
}

for _ in $(seq 1 480); do
  grep -q 'CHAIN5 COMPLETE' logs/r4_chain5.log 2>/dev/null && break
  sleep 30
done

step graph1m 3200 python tools/graph_scale.py 1000000 128 uniform 64 graph

step bench 580 python bench.py

echo "CHAIN6 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
