#!/bin/bash
# Wait out a relay outage (probe in short-lived subprocesses so nothing
# holds the TPU), then run the measurement chain exactly once:
#   tpu_smoke (end-to-end verify) -> bench.py (headline) ->
#   graph_scale 400k x 96 -> graph_scale 1M x 128 (uniform, SIFT1M class)
# One TPU process at a time throughout (each step is sequential).
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
  if [ "$tries" -ge 90 ]; then echo "[await] giving up after ~5h"; exit 1; fi
  sleep 170
done
echo "[await] relay ALIVE at $(date -u +%H:%M:%S); starting chain"

echo "=== tpu_smoke ==="
timeout 900 python tools/tpu_smoke.py || echo "SMOKE FAILED rc=$?"
echo "=== bench.py ==="
timeout 900 python bench.py || echo "BENCH FAILED rc=$?"
echo "=== graph_scale 400k x 96 (both) ==="
timeout 5400 python tools/graph_scale.py 400000 96 both || echo "GS400K FAILED rc=$?"
echo "=== graph_scale 1M x 128 (uniform) ==="
timeout 9000 python tools/graph_scale.py 1000000 128 uniform || echo "GS1M FAILED rc=$?"
echo "=== chain done $(date -u +%H:%M:%S) ==="
