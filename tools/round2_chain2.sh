#!/bin/bash
# Round-2 follow-up measurement chain: waits for round2_chain.sh to finish
# (its log ends with "round2 chain done"), then measures the NEW graph
# build defaults (forward-first augmentation, 8192-seed init, deg cap 128)
# and records autotune operating-point tables on-chip:
#   graph_scale 400k x 96 (uniform + clustered)  — VERDICT #2 table
#   graph_scale 1M x 128 uniform                 — queued packed sweep
#   autotune IVF4096 / HNSW32 / HNSW128 at 400k  — Pareto operating points
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

tries=0
until grep -q "round2 chain done" .round2_chain.log 2>/dev/null; do
  tries=$((tries + 1))
  if [ "$tries" -ge 300 ]; then echo "[chain2] gave up waiting (~15h)"; exit 1; fi
  sleep 180
done
echo "[chain2] chain1 done; starting $(date -u +%H:%M:%S)"

echo "=== graph_scale 400k x 96 (both corpora, new build defaults) ==="
timeout 7200 python tools/graph_scale.py 400000 96 both || echo "GS400K FAILED rc=$?"
echo "=== autotune IVF4096 (400k x 96 clustered) ==="
timeout 3600 python tools/autotune.py --n 400000 --d 96 --factory IVF4096,Flat \
  || echo "TUNE-IVF FAILED rc=$?"
echo "=== autotune HNSW32 (400k x 96 clustered) ==="
timeout 5400 python tools/autotune.py --n 400000 --d 96 --factory HNSW32 \
  || echo "TUNE-H32 FAILED rc=$?"
echo "=== autotune HNSW128 (400k x 96 clustered) ==="
timeout 5400 python tools/autotune.py --n 400000 --d 96 --factory HNSW128 \
  || echo "TUNE-H128 FAILED rc=$?"
echo "=== graph_scale 1M x 128 (uniform) ==="
timeout 9000 python tools/graph_scale.py 1000000 128 uniform || echo "GS1M FAILED rc=$?"
echo "=== chain2 done $(date -u +%H:%M:%S) ==="
