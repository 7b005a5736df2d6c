#!/bin/bash
# Round-3 master chain #3b: the pairs decomposition re-run (the
# master-#2 attempt died with the relay mid-epilogue-measurement) at
# both the profile shape and a marco-like lmax=2048 shape.  Runs after
# master #3's probes.
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
    echo "[master3b] relay down (probe #$tries) $(date -u +%H:%M:%S)"
    if [ "$tries" -ge 120 ]; then echo "[master3b] giving up"; exit 1; fi
    sleep 170
  done
  echo "[master3b] relay alive $(date -u +%H:%M:%S)"
}

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  await_relay
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" || echo "$name FAILED rc=$?"
  echo "=== $name end $(date -u +%H:%M:%S) ==="
}

step "spill_profile"     2700 python tools/spill_profile.py
step "pairs_decomp"      2700 python tools/pairs_profile.py \
  --skip-sweeps --skip-spill
step "pairs_decomp_2048" 2700 python tools/pairs_profile.py \
  --skip-sweeps --skip-spill --lmax 2048
step "spill_ab"          2700 python tools/pairs_profile.py --skip-pairs
step "flat_ab"           2700 python tools/pairs_profile.py --flat
echo "=== master3b done $(date -u +%H:%M:%S) ==="
