#!/bin/bash
# Round-2 chain 6 (after chain5): corrected SQ8 layout + headline re-emit.
# The spherical-trained corpus (max list 3.5x avg) made the pessimistic
# spill predictor shrink lmax to 1536 (capacity < n -> forced 33% spill);
# at budget 14.0 the predictor accepts lmax 2048 (capacity 8.39M, ~5-10%
# true spill) — the layout chain4 measured at 7.6%.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

tries=0
until grep -q "chain5 done" .round2_chain5.log 2>/dev/null; do
  tries=$((tries + 1))
  if [ "$tries" -ge 300 ]; then echo "[chain6] gave up waiting"; exit 1; fi
  sleep 120
done
echo "[chain6] chain5 done; starting $(date -u +%H:%M:%S)"

probe() {
  timeout 140 python - <<'PYEOF'
import threading, numpy as np, sys
ok = []
def p():
    import jax.numpy as jnp
    ok.append(float(np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0][0]))
t = threading.Thread(target=p, daemon=True); t.start(); t.join(110)
sys.exit(0 if ok else 1)
PYEOF
}
tries=0
until probe; do
  tries=$((tries + 1))
  echo "[chain6] relay down (probe #$tries) $(date -u +%H:%M:%S)"
  if [ "$tries" -ge 160 ]; then echo "[chain6] giving up"; exit 1; fi
  sleep 170
done

echo "=== marco SQ8 IP unit-norm lmax-2048 (pairs) ==="
timeout 10800 python tools/marco_device.py --storage SQ8 --metric IP \
  --unit-norm --assign-topk 4 --budget-gb 14.0 \
  || echo "MARCO-SQ8-2048 FAILED rc=$?"
echo "=== bench.py ==="
timeout 900 python bench.py || echo "BENCH FAILED rc=$?"
echo "=== chain6 done $(date -u +%H:%M:%S) ==="
