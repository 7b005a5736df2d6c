#!/bin/bash
# Round-4 chain 2: graph build-quality runs + gate refresh.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r4_chain2
step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
}

# 1. marco graph, quality build: carry degree 64, ~full membership
#    coverage (phase 3 ~4x round-4 chain1's 100 s)
step marco_graph_q 3500 python tools/marco_graph.py \
    --inter 64 --deg 32 --lmax-factor 3.0

# (1M deg-128 graph runs in chain1 step 6; not repeated here)

# 2. refresh the pairs-vs-per-query crossover grid on a healthy chip
#    (the checked-in table was measured under round-3 relay drift)
step crossover 3200 python tools/pairs_profile.py --crossover

echo "CHAIN2 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"

# 3. SQ6 sweep retry (sq_utile sub-tile fix for the lmax-2560 grid kernel)
step sq6_retry 3000 python tools/marco_device.py --storage SQ6 \
    --metric IP --unit-norm --assign-topk 4 --budget-gb 13.5
