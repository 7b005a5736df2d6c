#!/bin/bash
# Round-2 chain 5 (after chain4): pair-tile kernel on-chip.
#   tpu_smoke                      — end-to-end after serve/scan changes
#   validate_sq8_pallas            — Mosaic lowering + pairs A/B sections
#   marco SQ8 IP unit-norm         — b256/b1024 now ride the pairs kernel
#   marco SQ4 IP unit-norm         — same (pass A cached from chain4)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

tries=0
until grep -q "chain4 done" .round2_chain4.log 2>/dev/null; do
  tries=$((tries + 1))
  if [ "$tries" -ge 200 ]; then echo "[chain5] gave up waiting"; exit 1; fi
  sleep 120
done
echo "[chain5] chain4 done at $(date -u +%H:%M:%S); probing relay"

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
  echo "[chain5] relay down (probe #$tries) $(date -u +%H:%M:%S)"
  if [ "$tries" -ge 160 ]; then echo "[chain5] giving up"; exit 1; fi
  sleep 170
done
echo "[chain5] relay ALIVE at $(date -u +%H:%M:%S); starting"

echo "=== tpu_smoke ==="
timeout 900 python tools/tpu_smoke.py || echo "SMOKE FAILED rc=$?"
echo "=== validate_sq8_pallas (incl pairs) ==="
timeout 5400 python tools/validate_sq8_pallas.py || echo "VALIDATE FAILED rc=$?"
echo "=== marco SQ8 IP unit-norm (pairs) ==="
timeout 10800 python tools/marco_device.py --storage SQ8 --metric IP \
  --unit-norm --assign-topk 4 --budget-gb 13.5 \
  || echo "MARCO-SQ8-PAIRS FAILED rc=$?"
echo "=== marco SQ4 IP unit-norm (pairs) ==="
timeout 10800 python tools/marco_device.py --storage SQ4 --metric IP \
  --unit-norm --assign-topk 4 --budget-gb 13.5 \
  || echo "MARCO-SQ4-PAIRS FAILED rc=$?"
echo "=== chain5 done $(date -u +%H:%M:%S) ==="
