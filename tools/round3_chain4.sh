#!/bin/bash
# Round-3 chain 4 (after chain3):
#   marco_filtered --config4  — BASELINE config 4 (1M rows, id%2==0)
#   graph_scale 1M x 128      — uniform recall with row-split int4 packs
#                               (degree 128 past the old single-tensor cap)
#   tpu_smoke                 — end-to-end verify on the real chip
#   bench.py                  — headline re-emit with rtt field
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

tries=0
until grep -q "chain3 done" logs/r3_chain3.log 2>/dev/null; do
  tries=$((tries + 1))
  if [ "$tries" -ge 300 ]; then echo "[chain4] gave up waiting"; exit 1; fi
  sleep 120
done
echo "[chain4] chain3 done; starting $(date -u +%H:%M:%S)"

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
  echo "[chain4] relay down (probe #$tries) $(date -u +%H:%M:%S)"
  if [ "$tries" -ge 120 ]; then echo "[chain4] giving up"; exit 1; fi
  sleep 170
done

echo "=== config4 (1M, id%2==0) ==="
timeout 3600 python tools/marco_filtered.py --config4 \
  || echo "CONFIG4 FAILED rc=$?"
echo "=== graph_scale 1M x 128 uniform ==="
timeout 7200 python tools/graph_scale.py 1000000 128 uniform 32 graph \
  || echo "GRAPH-1M FAILED rc=$?"
echo "=== tpu_smoke ==="
timeout 900 python tools/tpu_smoke.py || echo "SMOKE FAILED rc=$?"
echo "=== bench.py ==="
timeout 900 python bench.py || echo "BENCH FAILED rc=$?"
echo "=== chain4 done $(date -u +%H:%M:%S) ==="
