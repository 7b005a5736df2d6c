#!/bin/bash
# Round-2 chain 3: wait out the relay outage, then
#   tpu_smoke                                  — on-chip end-to-end verify
#   marco_device SQ4 --assign-topk 4           — capped-assignment re-run
#   marco_device SQ8 --assign-topk 4           — (first run spilled 57.7%)
#   graph_scale 400k x 96 uniform HNSW64/128   — VERDICT #2 uniform target
#   bench.py                                   — headline re-emit
# One TPU process at a time throughout.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 140 python - <<'EOF'
import threading, numpy as np, sys
ok = []
def p():
    import jax.numpy as jnp
    ok.append(float(np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0][0]))
t = threading.Thread(target=p, daemon=True); t.start(); t.join(110)
sys.exit(0 if ok else 1)
EOF
}

tries=0
until probe; do
  tries=$((tries + 1))
  echo "[await] relay down (probe #$tries) $(date -u +%H:%M:%S)"
  if [ "$tries" -ge 150 ]; then echo "[await] giving up after ~8h"; exit 1; fi
  sleep 170
done
echo "[await] relay ALIVE at $(date -u +%H:%M:%S); starting chain3"

echo "=== tpu_smoke ==="
timeout 900 python tools/tpu_smoke.py || echo "SMOKE FAILED rc=$?"
echo "=== marco_device SQ4 capped (8.8M x 1536) ==="
timeout 14400 python tools/marco_device.py --storage SQ4 --assign-topk 4 \
  --budget-gb 13.5 || echo "MARCO-SQ4 FAILED rc=$?"
echo "=== marco_device SQ8 capped (8.8M x 1536) ==="
timeout 14400 python tools/marco_device.py --storage SQ8 --assign-topk 4 \
  --budget-gb 13.5 || echo "MARCO-SQ8 FAILED rc=$?"
echo "=== graph_scale 400k x 96 uniform HNSW64 (graph only) ==="
timeout 5400 python tools/graph_scale.py 400000 96 uniform 64 graph \
  || echo "GS-H64 FAILED rc=$?"
echo "=== graph_scale 400k x 96 uniform HNSW128 (graph only) ==="
timeout 7200 python tools/graph_scale.py 400000 96 uniform 128 graph \
  || echo "GS-H128 FAILED rc=$?"
echo "=== bench.py ==="
timeout 900 python bench.py || echo "BENCH FAILED rc=$?"
echo "=== chain3 done $(date -u +%H:%M:%S) ==="
