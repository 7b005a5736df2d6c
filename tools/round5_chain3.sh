#!/bin/bash
# Round-5 chain 3 (after chain 2): the HNSW-recall ask (#2).
#   deg-64 adjacency + one coded NN-descent round + SQ6 serving codes at
#   8,841,823 x 1536 — the identified caps of the round-4 0.610@ef128
#   build were final degree 32 and no NN-descent at scale.
#   Target: recall@10 >= 0.75 @ ef128 b48 (VERDICT r4 #2).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r5_chain3

for _ in $(seq 1 900); do
  grep -q 'CHAIN2 COMPLETE' logs/r5_chain2.log 2>/dev/null && break
  sleep 30
done
echo "[chain3] starting $(date -u +%H:%M:%S)" >> "$L.log"

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  sleep 20
}

step walk_debug_folded 1500 python tools/walk_debug.py --deg 64 --codec sq6

step graph_deg64_descent 8000 python tools/marco_graph.py \
    --deg 64 --inter 64 --lmax-factor 3.0 --serve-codec sq6 \
    --refine-rounds 1

step bench_refresh 900 python bench.py --refresh
echo "CHAIN3 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
