#!/bin/bash
# Round-5 chain 1: wait out the relay outage, then
#   1. epilogue_profile — the serving-epilogue decomposition + fp16 wire
#      A/B + fused-jit A/B (VERDICT ask #1 measurement)
#   2. walk_debug deg-64 sq6 — repro of the round-4 walk compile failure
#      with the fixed chunked generation (ask #2 prerequisite)
#   3. batch_amortization — b1/b48/b1024/pipelined (ask #8)
#   4. bench.py — refresh the headline + cache
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r5_chain1

probe() {
  timeout 140 python - <<'EOF'
import threading, numpy as np, sys, os
ok = []
def p():
    import jax.numpy as jnp
    ok.append(float(np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0][0]))
t = threading.Thread(target=p, daemon=True); t.start(); t.join(110)
sys.stdout.flush()
os._exit(0 if ok else 1)
EOF
}

tries=0
until probe; do
  tries=$((tries + 1))
  echo "[await] relay down (probe #$tries) $(date -u +%H:%M:%S)" >> "$L.log"
  if [ "$tries" -ge 90 ]; then echo "[await] giving up" >> "$L.log"; exit 1; fi
  sleep 170
done
echo "[await] relay ALIVE at $(date -u +%H:%M:%S)" >> "$L.log"

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  sleep 20
}

step epilogue 3000 python tools/epilogue_profile.py
step walk_debug 1500 python tools/walk_debug.py --deg 64 --codec sq6
step batch_amort 1800 python tools/batch_amortization.py
step bench 580 python bench.py
echo "CHAIN1 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
