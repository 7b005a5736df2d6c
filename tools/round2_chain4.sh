#!/bin/bash
# Round-2 chain 4: the reference-faithful MARCO runs.
#   tpu_smoke                                   — verify after ivf_scan edits
#   marco SQ4 IP unit-norm capped               — ada2-style workload
#   marco SQ8 IP unit-norm capped               — same, SQ8 storage
#   marco SQ8 L2 raw capped                     — pathological-skew corpus,
#                                                 pessimistic spill sizing +
#                                                 window-max spill scan
#   bench.py                                    — headline re-emit
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
echo "[await] relay ALIVE at $(date -u +%H:%M:%S); starting chain4"

echo "=== tpu_smoke ==="
timeout 900 python tools/tpu_smoke.py || echo "SMOKE FAILED rc=$?"
echo "=== marco SQ4 IP unit-norm capped ==="
timeout 14400 python tools/marco_device.py --storage SQ4 --metric IP \
  --unit-norm --assign-topk 4 --budget-gb 13.5 \
  || echo "MARCO-SQ4-IP FAILED rc=$?"
echo "=== marco SQ8 IP unit-norm capped ==="
timeout 14400 python tools/marco_device.py --storage SQ8 --metric IP \
  --unit-norm --assign-topk 4 --budget-gb 13.5 \
  || echo "MARCO-SQ8-IP FAILED rc=$?"
echo "=== marco SQ8 L2 raw (chain1 layout, window-max spill scan A/B) ==="
timeout 14400 python tools/marco_device.py --storage SQ8 \
  --budget-gb 14.0 || echo "MARCO-SQ8-L2 FAILED rc=$?"
echo "=== bench.py ==="
timeout 900 python bench.py || echo "BENCH FAILED rc=$?"
echo "=== chain4 done $(date -u +%H:%M:%S) ==="
