#!/bin/bash
# Round-3 chain 3 (after chain2):
#   marco_device SQ6   — fill the marco recall/qps Pareto hole (VERDICT #4)
#   marco_filtered     — three-strategy filtered sweep at 8.8M (VERDICT #3)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

tries=0
until grep -q "chain2 done" logs/r3_chain2.log 2>/dev/null; do
  tries=$((tries + 1))
  if [ "$tries" -ge 250 ]; then echo "[chain3] gave up waiting"; exit 1; fi
  sleep 120
done
echo "[chain3] chain2 done; starting $(date -u +%H:%M:%S)"

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
  echo "[chain3] relay down (probe #$tries) $(date -u +%H:%M:%S)"
  if [ "$tries" -ge 120 ]; then echo "[chain3] giving up"; exit 1; fi
  sleep 170
done

echo "=== marco SQ6 IP unit-norm (Pareto fill) ==="
timeout 10800 python tools/marco_device.py --storage SQ6 --metric IP \
  --unit-norm --assign-topk 4 --budget-gb 13.0 \
  || echo "MARCO-SQ6 FAILED rc=$?"
echo "=== marco_filtered (8.8M three-strategy) ==="
timeout 10800 python tools/marco_filtered.py || echo "MARCO-FILTERED FAILED rc=$?"
echo "=== chain3 done $(date -u +%H:%M:%S) ==="
