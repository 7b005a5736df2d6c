#!/bin/bash
# Round-4 chain 4 (session 2): retries with this session's fixes.
#   1. validate — sq6 per-query + pairs kernels on chip at small scale
#      (first on-chip run of the FOLDED (nlist, 3*lmax, d4) plane-major
#      payload; the 4-D layout forced a 15 G Mosaic relayout copy).
#   2. sq6     — marco 8.8M x 1536 SQ6 sweep (the r3/r4 Pareto-hole ask).
#   3. filtered— 8.8M three-strategy filtered sweep (query-blocked
#      reranks + spill-capacity trim now in).
#   4. graph1m — 1M x 128 deg-128 graph build (per-chunk sync fix).
#   5. bench   — healthy-capture headline refresh.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r4_chain4
step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  sleep 20
}

step validate 1500 python tools/validate_sq8_pallas.py

step sq6 3000 python tools/marco_device.py --storage SQ6 \
    --metric IP --unit-norm --assign-topk 4 --budget-gb 13.5

step filtered 3600 python tools/marco_filtered.py

step graph1m 3200 python tools/graph_scale.py 1000000 128 uniform 64 graph

step bench 580 python bench.py

echo "CHAIN4 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
