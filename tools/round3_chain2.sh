#!/bin/bash
# Round-3 chain 2 (after chain1):
#   pairs_profile --crossover  — gate-table grid (VERDICT #8 data)
#   marco_graph                — the reference's headline index family
#                                (HNSW128-equivalent walk) at 8.8M x 1536
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

tries=0
until grep -q "chain1 done" logs/r3_chain1.log 2>/dev/null; do
  tries=$((tries + 1))
  if [ "$tries" -ge 200 ]; then echo "[chain2] gave up waiting"; exit 1; fi
  sleep 120
done
echo "[chain2] chain1 done; starting $(date -u +%H:%M:%S)"

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
  echo "[chain2] relay down (probe #$tries) $(date -u +%H:%M:%S)"
  if [ "$tries" -ge 120 ]; then echo "[chain2] giving up"; exit 1; fi
  sleep 170
done

echo "=== pairs_profile --crossover ==="
timeout 3600 python tools/pairs_profile.py --crossover \
  || echo "CROSSOVER FAILED rc=$?"
echo "=== marco_graph (8.8M x 1536 graph walk) ==="
timeout 10800 python tools/marco_graph.py || echo "MARCO-GRAPH FAILED rc=$?"
echo "=== chain2 done $(date -u +%H:%M:%S) ==="
