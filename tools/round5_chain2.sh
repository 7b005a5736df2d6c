#!/bin/bash
# Round-5 chain 2 (after chain 1): the long marco measurements.
#   1. marco_filtered — 8.8M three-strategy sweep with the device-side /
#      cached selector masks (ask #4 validation)
#   2. marco_trec — k=1000 conformance over the frozen 8.8M index (ask #5)
#   3. marco_refine — fp16 host-store refine tier, recall >= 0.95 target
#      (ask #7; first run also fetches + caches the 27 GiB store)
#   4. bench refresh
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r5_chain2

for _ in $(seq 1 720); do
  grep -q 'CHAIN1 COMPLETE' logs/r5_chain1.log 2>/dev/null && break
  sleep 30
done
echo "[chain2] starting $(date -u +%H:%M:%S)" >> "$L.log"

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  sleep 20
}

step filtered 3600 python tools/marco_filtered.py
step trec 3600 python tools/marco_trec.py
step bench_refresh 900 python bench.py --refresh
echo "CHAIN2 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
