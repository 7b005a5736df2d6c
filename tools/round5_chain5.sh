#!/bin/bash
# Round-5 chain 4 (regenerated 02:20Z with relay-await gates).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r5_chain5

probe() {
  timeout 140 python - <<'PYEOF'
import threading, numpy as np, sys, os
ok = []
def p():
    import jax.numpy as jnp
    ok.append(float(np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0][0]))
t = threading.Thread(target=p, daemon=True); t.start(); t.join(110)
sys.stdout.flush()
os._exit(0 if ok else 1)
PYEOF
}

await_relay() {
  local tries=0
  until probe; do
    tries=$((tries + 1))
    echo "[await] relay down (probe #$tries) $(date -u +%H:%M:%S)" >> "$L.log"
    if [ "$tries" -ge 120 ]; then echo "[await] giving up" >> "$L.log"; exit 1; fi
    sleep 170
  done
  echo "[await] relay ALIVE $(date -u +%H:%M:%S)" >> "$L.log"
}

for _ in $(seq 1 900); do
  grep -q 'CHAIN3 COMPLETE' logs/r5_chain3.log 2>/dev/null && break
  sleep 30
done
echo "[chain5] gate passed $(date -u +%H:%M:%S)" >> "$L.log"
await_relay

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  sleep 20
}

step batch_amort 2400 python tools/batch_amortization.py
await_relay
step bench_refresh 900 python bench.py --refresh
echo "CHAIN5 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
