#!/bin/bash
# Round-4 session-B chip queue (fresh host, /tmp wiped, weights lost with it).
# Order: short perf probes FIRST while the host CPU is quiet (relay timings
# corrupt under CPU contention), then the long resumable protocol-eval legs
# for the two tasks with no artifact yet. open_drawer is NOT queued here —
# its 8% result gets a diagnosis pass before any retrain. open_jar is done
# (96% test, nd recipe, committed).
#
#   bash tools/chip_queue_r4b.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq9}"
mkdir -p "$LOGDIR"

echo "[chipq] waiting for relay chip..." | tee "$LOGDIR/status"
until timeout 300 python -u -c "import jax; assert jax.devices()" \
      > "$LOGDIR/poll.log" 2>&1; do
  echo "[chipq] $(date +%H:%M:%S) relay still down" | tee -a "$LOGDIR/status"
  sleep 120
done
echo "[chipq] $(date +%H:%M:%S) relay UP" | tee -a "$LOGDIR/status"

run() {  # run <name> <timeout-s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "[chipq] $(date +%H:%M:%S) START $name" | tee -a "$LOGDIR/status"
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "[chipq] $(date +%H:%M:%S) DONE $name exit=$?" | tee -a "$LOGDIR/status"
}

run act_ab 5400 python -u tools/probe_act_ab.py
run sam_ab 3000 python -u tools/profile_sam.py
run protocol_eval 28800 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks put_item_in_drawer hand_over_item \
    --iters 6000 --save-freq 2000 --platform tpu
echo "[chipq] ALL DONE" | tee -a "$LOGDIR/status"
