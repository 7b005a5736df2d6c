#!/bin/bash
# Round-4 chain 2: retries with fixes + graph quality build.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r4_chain2
step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  sleep 20   # let a crashed TPU worker restart before the next step
}

# 1. SQ6 sweep retry (sq_utile sub-tile fix for the lmax-2560 grid kernel)
step sq6_retry 3000 python tools/marco_device.py --storage SQ6 \
    --metric IP --unit-norm --assign-topk 4 --budget-gb 13.5

# 2. 8.8M filtered retry (adaptive exact-rerank chunk + huge-k XLA gate;
#    the first attempt's 47 GB alloc killed the worker)
step filtered_retry 3000 python tools/marco_filtered.py

# 3. 1M deg-128 graph retry (died as collateral of the step above)
step graph1m_d128 3200 python tools/graph_scale.py 1000000 128 uniform 64 graph

# 4. marco graph, quality build: carry degree 64, ~full membership
#    coverage (phase 3 ~4x chain1's 100 s)
step marco_graph_q 3500 python tools/marco_graph.py \
    --inter 64 --deg 32 --lmax-factor 3.0

# 5. refresh the pairs-vs-per-query crossover grid on a healthy chip
step crossover 3200 python tools/pairs_profile.py --crossover

# 6. headline capture while healthy
step bench 580 python bench.py

echo "CHAIN2 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
