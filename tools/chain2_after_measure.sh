#!/bin/bash
# Second measurement chain: waits for a prior TPU chain (pid in $1) to
# finish, re-probes the relay, then runs the reference-corpus-shape
# measurement and the on-chip three-strategy filtered benchmark.
# ONE TPU process at a time throughout.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

CHAIN_PID="${1:-}"
if [ -n "$CHAIN_PID" ]; then
  while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 120; done
fi

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
  if [ "$tries" -ge 60 ]; then echo "[chain2] giving up"; exit 1; fi
  sleep 170
done
echo "[chain2] relay alive at $(date -u +%H:%M:%S)"

echo "=== marco_scale: MS MARCO corpus shape, IVF4096,SQ8 ==="
timeout 21600 python tools/marco_scale.py || echo "MARCO FAILED rc=$?"
echo "=== filtered benchmark on-chip (1M x 128, IVF4096) ==="
timeout 5400 python tools/benchmark_filtered.py --n 1000000 --d 128 \
  --factory 'IDMap,IVF4096,Flat' --nprobe 64 --passrates 1,10,50,99 \
  || echo "FILTBENCH FAILED rc=$?"
echo "=== chain2 done $(date -u +%H:%M:%S) ==="
