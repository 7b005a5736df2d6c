#!/bin/bash
# Round-2 chain 7 (after chain6): pairs-v2 (raw-score tiles) on-chip.
#   pairs_ab SQ8 + SQ4 at 2M x 1536    — isolated padded-scan A/B
#   marco SQ8 IP unit-norm (14.0 GB)   — v2 headline re-run
#   marco SQ4 IP unit-norm             — v2 headline re-run
#   bench.py                           — re-emit
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

tries=0
until grep -q "chain6 done" .round2_chain6.log 2>/dev/null; do
  tries=$((tries + 1))
  if [ "$tries" -ge 300 ]; then echo "[chain7] gave up waiting"; exit 1; fi
  sleep 120
done
echo "[chain7] chain6 done; starting $(date -u +%H:%M:%S)"

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
  echo "[chain7] relay down (probe #$tries) $(date -u +%H:%M:%S)"
  if [ "$tries" -ge 160 ]; then echo "[chain7] giving up"; exit 1; fi
  sleep 170
done

echo "=== pairs_ab SQ8 (2M x 1536) ==="
timeout 3600 python tools/pairs_ab.py --storage SQ8 || echo "AB-SQ8 FAILED rc=$?"
echo "=== pairs_ab SQ4 (2M x 1536) ==="
timeout 3600 python tools/pairs_ab.py --storage SQ4 || echo "AB-SQ4 FAILED rc=$?"
echo "=== marco SQ8 IP unit-norm v2 ==="
timeout 10800 python tools/marco_device.py --storage SQ8 --metric IP \
  --unit-norm --assign-topk 4 --budget-gb 14.0 \
  || echo "MARCO-SQ8-V2 FAILED rc=$?"
echo "=== marco SQ4 IP unit-norm v2 ==="
timeout 10800 python tools/marco_device.py --storage SQ4 --metric IP \
  --unit-norm --assign-topk 4 --budget-gb 13.5 \
  || echo "MARCO-SQ4-V2 FAILED rc=$?"
echo "=== bench.py ==="
timeout 900 python bench.py || echo "BENCH FAILED rc=$?"
echo "=== chain7 done $(date -u +%H:%M:%S) ==="
