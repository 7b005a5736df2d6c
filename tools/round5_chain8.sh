#!/bin/bash
# Round-5 chain 6: graph + refine + batch_amort (the chain-3 retry
# marker self-match bug burned the graph ask; markers are now passed
# base64-ish safe by grepping the step OUTPUT region only).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=logs/r5_chain8

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

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== STEP $name start $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  tools/chiplock.sh "$tmo" "$@" >> "$L.log" 2>&1
  echo "=== STEP $name rc=$? end $(date -u +%H:%M:%SZ) ===" >> "$L.log"
  sleep 20
}

# retry_step <marker> <name> <tmo> <cmd...>: re-run (fresh process, fresh
# relay-await) until the log gains <marker>, up to 4 attempts — mid-step
# relay deaths waste one attempt, not the whole ask.
retry_step() {
  local marker="$1" name="$2" tmo="$3"; shift 3
  for a in 1 2 3 4 5 6; do
    await_relay
    local before
    before=$(wc -l < "$L.log" 2>/dev/null || echo 0)
    step "$name#$a" "$tmo" "$@"
    if tail -n +"$before" "$L.log" | grep -q "$marker"; then
      return 0
    fi
    echo "[retry] $name attempt $a missed marker" >> "$L.log"
  done
  return 1
}

echo "[chain8] start $(date -u +%H:%M:%S)" >> "$L.log"

retry_step "BATCH-AMORTIZATION COMPLETE" batch_amort 2400 \
    python tools/batch_amortization.py
retry_step "MARCO-GRAPH COMPLETE" graph_descent2 9000 \
    python tools/marco_graph.py --deg 64 --inter 64 --lmax-factor 3.0 \
    --serve-codec sq6 --refine-rounds 2 --descent-rows 65536
await_relay
step bench 900 python bench.py
echo "CHAIN8 COMPLETE $(date -u +%H:%M:%SZ)" >> "$L.log"
