#!/bin/bash
# Round-4 session-C queue: restart the protocol eval killed with session B.
# put_item_in_drawer's dominant leg was interrupted before its first save, so
# the resume guard retrains it; hand_over_item starts fresh.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq11}"
mkdir -p "$LOGDIR"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "[chipq] $(date +%H:%M:%S) START $name" | tee -a "$LOGDIR/status"
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "[chipq] $(date +%H:%M:%S) DONE $name exit=$?" | tee -a "$LOGDIR/status"
}

run protocol_eval 25200 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks put_item_in_drawer hand_over_item \
    --iters 6000 --save-freq 2000 --platform tpu
echo "[chipq] ALL DONE" | tee -a "$LOGDIR/status"
