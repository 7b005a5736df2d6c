#!/bin/bash
# Round-3 master chain #5: kernel debug + remaining A/Bs, then the full
# marco measurement suite (replaces master4, whose watcher was removed
# for interactive debugging; also re-runs steps master3b may have
# garbled — it was edited while running, shifting bash's read offset).
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
    echo "[master5] relay down (probe #$tries) $(date -u +%H:%M:%S)"
    if [ "$tries" -ge 150 ]; then echo "[master5] giving up"; exit 1; fi
    sleep 170
  done
  echo "[master5] relay alive $(date -u +%H:%M:%S)"
}

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  await_relay
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" || echo "$name FAILED rc=$?"
  echo "=== $name end $(date -u +%H:%M:%S) ==="
}

export JAX_TRACEBACK_FILTERING=off
step "mega_debug"      1800 python tools/mega_debug.py
step "mega_debug_flat" 1800 python tools/mega_debug.py --flat
unset JAX_TRACEBACK_FILTERING
step "flat_ab"         2700 python tools/pairs_profile.py --flat
step "spill_profile"   2700 python tools/spill_profile.py
step "marco_diag"     10800 python tools/marco_diag.py
step "marco_sq6"      10800 python tools/marco_device.py --storage SQ6 \
  --metric IP --unit-norm --assign-topk 4 --budget-gb 13.0
step "marco_graph"    10800 python tools/marco_graph.py
step "marco_filtered" 10800 python tools/marco_filtered.py
step "graph_1m_d128"   7200 python tools/graph_scale.py 1000000 128 uniform 64 graph
step "tpu_smoke"        900 python tools/tpu_smoke.py
step "bench"            900 python bench.py
step "crossover"       3600 python tools/pairs_profile.py --crossover
echo "=== master5 done $(date -u +%H:%M:%S) ==="
