#!/bin/bash
# Round-5 chain 4 (after chain 3): the refine tier (ask #7) — lowest
# priority of the measured asks because its first run fetches the
# 27 GiB fp16 host store through the relay.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r5_chain4

for _ in $(seq 1 900); do
  grep -q 'CHAIN3 COMPLETE' logs/r5_chain3.log 2>/dev/null && break
  sleep 30
done
echo "[chain4] starting $(date -u +%H:%M:%S)" >> "$L.log"

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  sleep 20
}

step refine 7000 python tools/marco_refine.py
step bench_refresh 900 python bench.py --refresh
echo "CHAIN4 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
