#!/bin/bash
# Block until the axon relay answers a tiny matmul again, probing every
# ~4 min (the wedge documented in tools/ROUND5_PLAN.md "Platform notes":
# a killed-mid-RPC client can leave the pool chip busy; recovery time is
# unknown, so poll instead of guessing). Exits 0 on recovery, 1 if the
# deadline (arg 2, seconds, default 4h) passes first.
set -u
LOG="${1:-/tmp/tpu_health.log}"
DEADLINE="${2:-14400}"
start=$(date +%s)
attempt=0
while :; do
  attempt=$((attempt + 1))
  echo "[health] $(date +%H:%M:%S) probe #$attempt" >> "$LOG"
  if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x).block_until_ready()[0, 0]) == 256.0
" >> "$LOG" 2>&1; then
    echo "[health] $(date +%H:%M:%S) RECOVERED after $attempt probes" >> "$LOG"
    exit 0
  fi
  now=$(date +%s)
  if [ $((now - start)) -gt "$DEADLINE" ]; then
    echo "[health] $(date +%H:%M:%S) deadline passed, giving up" >> "$LOG"
    exit 1
  fi
  sleep 240
done
