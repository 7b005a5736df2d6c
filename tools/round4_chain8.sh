#!/bin/bash
# Round-4 chain 8: deg-64 graph retry (lane-safe SQ decode fix in).
# coverage 3.0 — chain2's quality build) + sq6 serving codes; the
# inter-96 attempt lane-padded its (n, 96) carries 96->128 and
# compile-OOMed (2x 4.22 G next to the 6.8 G sq4 buffer).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r4_chain8
step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  sleep 20
}

for _ in $(seq 1 480); do
  grep -q 'CHAIN7 COMPLETE' logs/r4_chain7.log 2>/dev/null && break
  sleep 30
done

step graph_deg64 5400 python tools/marco_graph.py \
    --deg 64 --inter 64 --lmax-factor 3.0 --serve-codec sq6

step bench 580 python bench.py

echo "CHAIN8 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
