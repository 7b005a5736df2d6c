#!/bin/bash
# Reference-corpus-scale chain: IVF4096,SQ4 then IVF4096,SQ8 at the full
# 8,841,823 x 1536 MS MARCO shape via device-resident ingest.  One TPU
# process at a time; each run is its own process so HBM frees between.
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
  echo "[marco-chain] relay down (probe #$tries) $(date -u +%H:%M:%S)"
  if [ "$tries" -ge 90 ]; then echo "[marco-chain] giving up"; exit 1; fi
  sleep 170
done
echo "[marco-chain] relay alive $(date -u +%H:%M:%S)"

echo "=== marco_device SQ4 (8.8M x 1536) ==="
timeout 14400 python tools/marco_device.py --storage SQ4 --budget-gb 13.5 \
  || echo "MARCO SQ4 FAILED rc=$?"
echo "=== marco_device SQ8 (8.8M x 1536) ==="
timeout 14400 python tools/marco_device.py --storage SQ8 --budget-gb 13.5 \
  || echo "MARCO SQ8 FAILED rc=$?"
echo "=== marco chain done $(date -u +%H:%M:%S) ==="
