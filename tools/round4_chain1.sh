#!/bin/bash
# Round-4 measurement chain.  One step at a time under the shared chip
# lock (tools/chiplock.sh) so bench.py can slot in between steps; fixed
# per-step timeouts; NEVER edit this file while it runs (use a new
# chain file for follow-ups — the r3 master3b read-offset lesson).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r4_chain1
step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
}

# 1. SQ8 full sweep with GT (freezes the benchmark index + pass-A cache)
step sq8_sweep 3500 python tools/marco_device.py --storage SQ8 \
    --metric IP --unit-norm --assign-topk 4 --budget-gb 14.0

# 2. serving decomposition incl. pallas/xla spill + mega A/B rows
step diag 2500 python tools/marco_diag.py

# 3. SQ4 sweep (shares the frozen k-means)
step sq4_sweep 3000 python tools/marco_device.py --storage SQ4 \
    --metric IP --unit-norm --assign-topk 4 --budget-gb 13.5

# 4. SQ6 sweep — the Pareto hole; flat-row scatter fix
step sq6_sweep 3000 python tools/marco_device.py --storage SQ6 \
    --metric IP --unit-norm --assign-topk 4 --budget-gb 13.5

# 5. three-strategy filtered sweep at 8,841,823 rows
step filtered 3000 python tools/marco_filtered.py

# 6. graph 1M deg-128 uniform (HNSW64 surface)
step graph1m 3200 python tools/graph_scale.py 1000000 128 uniform 64 graph

# 7. healthy-capture headline (also refreshes .bench_last compute_ms)
step bench 580 python bench.py

echo "CHAIN1 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
