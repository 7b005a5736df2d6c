#!/bin/bash
# Round-4 chain 5: marco graph quality build #2 — deg 64 (the identified
# recall cap of the deg-32 builds), inter 96, coverage 3.0, SQ6 serving
# codes (10.2 GiB leaves ~2.3 GiB for the deg-64 adjacency).  Gated on
# chain 4 finishing so steps never interleave on the one chip.
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

# Gate: wait for chain4 (up to 3.5 h), then go regardless (flock still
# serializes against any straggler step).
for _ in $(seq 1 420); do
  grep -q 'CHAIN4 COMPLETE' logs/r4_chain4.log 2>/dev/null && break
  sleep 30
done

step graph_deg64 5400 python tools/marco_graph.py \
    --deg 64 --inter 96 --lmax-factor 3.0 --serve-codec sq6

step bench 580 python bench.py

echo "CHAIN5 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
