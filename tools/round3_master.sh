#!/bin/bash
# Round-3 master measurement chain (after chain1: pairs_profile default
# mode OOMed on the payload generator — fixed — and marco_diag ran).
# Each step probes the relay first (it dies mid-session; probe-wait
# between steps makes the chain resilient), runs under timeout, and
# marks progress in this log.  ONE TPU process at a time throughout.
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

await_relay() {
  local tries=0
  until probe; do
    tries=$((tries + 1))
    echo "[master] relay down (probe #$tries) $(date -u +%H:%M:%S)"
    if [ "$tries" -ge 120 ]; then echo "[master] giving up"; exit 1; fi
    sleep 170
  done
  echo "[master] relay alive $(date -u +%H:%M:%S)"
}

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  await_relay
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" || echo "$name FAILED rc=$?"
  echo "=== $name end $(date -u +%H:%M:%S) ==="
}

# Wait for chain1 (marco_diag) to release the chip.
tries=0
until grep -q "chain1 done" logs/r3_chain1.log 2>/dev/null; do
  tries=$((tries + 1))
  if [ "$tries" -ge 200 ]; then echo "[master] chain1 never finished"; exit 1; fi
  sleep 60
done
echo "[master] chain1 done; starting $(date -u +%H:%M:%S)"

step "pairs_profile"  2700 python tools/pairs_profile.py
step "crossover"      3600 python tools/pairs_profile.py --crossover
step "marco_graph"   10800 python tools/marco_graph.py
step "marco_sq6"     10800 python tools/marco_device.py --storage SQ6 \
  --metric IP --unit-norm --assign-topk 4 --budget-gb 13.0
step "marco_filtered" 10800 python tools/marco_filtered.py
step "config4"        3600 python tools/marco_filtered.py --config4
step "graph_1m"       7200 python tools/graph_scale.py 1000000 128 uniform 32 graph
step "tpu_smoke"       900 python tools/tpu_smoke.py
step "bench"           900 python bench.py
echo "=== master done $(date -u +%H:%M:%S) ==="
