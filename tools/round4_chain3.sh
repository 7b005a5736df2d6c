#!/bin/bash
# Round-4 chain 3: retries with the session's fixes in place.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r4_chain3
step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  sleep 20
}

# 1. SQ6 sweep (sq_utile 128-row sub-tiles for the lmax-2560 block)
step sq6 3000 python tools/marco_device.py --storage SQ6 \
    --metric IP --unit-norm --assign-topk 4 --budget-gb 13.5

# 2. 8.8M filtered (query-blocked sq_exact_rerank for k'=1874)
step filtered 3000 python tools/marco_filtered.py

# 3. 1M deg-128 graph (host-chunked exact kNN build)
step graph1m 3200 python tools/graph_scale.py 1000000 128 uniform 64 graph

# 4. headline capture
step bench 580 python bench.py

echo "CHAIN3 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
