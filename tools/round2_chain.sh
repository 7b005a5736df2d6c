#!/bin/bash
# Round-2 on-chip measurement chain.  Waits out a relay outage (probing in
# short-lived subprocesses so nothing holds the TPU), then runs exactly once:
#   tpu_smoke            — end-to-end verify after the SQ/kernel changes
#   validate_sq8_pallas  — Mosaic lowering A/B for SQ8+SQ4+SQ6+LSH int8
#   marco_device SQ4     — 8,841,823 x 1536 reference-scale run (VERDICT #1)
#   marco_device SQ8     — same, SQ8 storage (gather/spill regime)
#   bench.py             — headline JSON
# One TPU process at a time throughout (steps are sequential).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

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
  echo "[round2-chain] relay down (probe #$tries) $(date -u +%H:%M:%S)"
  if [ "$tries" -ge 150 ]; then echo "[round2-chain] giving up (~8h)"; exit 1; fi
  sleep 170
done
echo "[round2-chain] relay ALIVE at $(date -u +%H:%M:%S); starting"

echo "=== tpu_smoke ==="
timeout 900 python tools/tpu_smoke.py || echo "SMOKE FAILED rc=$?"
echo "=== validate_sq8_pallas (sq8/sq4/sq6/lsh) ==="
timeout 3600 python tools/validate_sq8_pallas.py || echo "SQVAL FAILED rc=$?"
echo "=== marco_device SQ4 (8.8M x 1536) ==="
timeout 14400 python tools/marco_device.py --storage SQ4 --budget-gb 13.5 \
  || echo "MARCO SQ4 FAILED rc=$?"
echo "=== marco_device SQ8 (8.8M x 1536) ==="
timeout 14400 python tools/marco_device.py --storage SQ8 --budget-gb 13.5 \
  || echo "MARCO SQ8 FAILED rc=$?"
echo "=== bench.py headline ==="
timeout 900 python bench.py || echo "BENCH FAILED rc=$?"
echo "=== round2 chain done $(date -u +%H:%M:%S) ==="
