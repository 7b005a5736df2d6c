#!/bin/bash
# Round-4 chain 5 (v2): filtered retry FIRST (VERDICT top-4 ask; spill
# chunk-legality fix in), then the deg-64 SQ6-serving marco graph build,
# then a bench refresh.  Gated on chain 4 finishing so steps never
# interleave on the one chip.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r4_chain5
step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  sleep 20
}

for _ in $(seq 1 420); do
  grep -q 'CHAIN4 COMPLETE' logs/r4_chain4.log 2>/dev/null && break
  sleep 30
done

step filtered 3600 python tools/marco_filtered.py

step graph_deg64 5400 python tools/marco_graph.py \
    --deg 64 --inter 96 --lmax-factor 3.0 --serve-codec sq6

step bench 580 python bench.py

echo "CHAIN5 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
