#!/bin/bash
# Round-3 chain 1: wait out the relay outage, then
#   marco_diag      — serving decomposition after the ways/padding-skip/
#                     bf16-spill kernel changes (VERDICT #1 measurement)
#   pairs_profile   — (qg, ways) sweep + spill int8-vs-bf16 A/B at the
#                     marco shape, no 8.8M build (VERDICT #8 data)
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
  echo "[chain1] relay down (probe #$tries) $(date -u +%H:%M:%S)"
  if [ "$tries" -ge 120 ]; then echo "[chain1] giving up after ~6h"; exit 1; fi
  sleep 170
done
echo "[chain1] relay ALIVE $(date -u +%H:%M:%S)"

echo "=== pairs_profile (kernel-level, no build) ==="
timeout 2700 python tools/pairs_profile.py || echo "PAIRS-PROFILE FAILED rc=$?"
echo "=== marco_diag (8.8M SQ8 decomposition) ==="
timeout 5400 python tools/marco_diag.py || echo "MARCO-DIAG FAILED rc=$?"
echo "=== chain1 done $(date -u +%H:%M:%S) ==="
