#!/bin/bash
# Round-3 master chain #3 (session 2): short diagnostics first (spill
# decomposition + MXU per-step probe — they steer this session's kernel
# work), then the long marco re-runs that failed in master #1 before
# their fixes landed, then smoke + bench.  ONE TPU process at a time.
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
    echo "[master4] relay down (probe #$tries) $(date -u +%H:%M:%S)"
    if [ "$tries" -ge 120 ]; then echo "[master4] giving up"; exit 1; fi
    sleep 170
  done
  echo "[master4] relay alive $(date -u +%H:%M:%S)"
}

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  await_relay
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" || echo "$name FAILED rc=$?"
  echo "=== $name end $(date -u +%H:%M:%S) ==="
}

step "marco_diag"    10800 python tools/marco_diag.py
step "marco_sq6"     10800 python tools/marco_device.py --storage SQ6 \
  --metric IP --unit-norm --assign-topk 4 --budget-gb 13.0
step "marco_graph"   10800 python tools/marco_graph.py
step "marco_filtered" 10800 python tools/marco_filtered.py
step "graph_1m_d128"  7200 python tools/graph_scale.py 1000000 128 uniform 64 graph
step "tpu_smoke"       900 python tools/tpu_smoke.py
step "bench"           900 python bench.py
# The gate's MEASURED table was taken with the int8 digit dots; the
# bf16 lowering changes both paths — re-measure the crossover grid.
step "crossover"      3600 python tools/pairs_profile.py --crossover
echo "=== master4 done $(date -u +%H:%M:%S) ==="
