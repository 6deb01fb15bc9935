#!/bin/bash
# Round-4 session-B follow-on queue (after chipq9's sam_ab):
#   1. act_ab rerun — the unroll8 Mosaic concat bug is fixed (lane-mask build
#      of the scatter row); this is the decision data for the bench flag
#      defaults AND the on-chip drive of the changed front kernel.
#   2. open_drawer pair training only — weights feed the CPU-side open-loop
#      probe (tools/probe_policy_open_loop.py) while the chip moves on.
#   3. protocol eval for the two tasks with no artifact yet.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq10}"
mkdir -p "$LOGDIR"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "[chipq] $(date +%H:%M:%S) START $name" | tee -a "$LOGDIR/status"
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "[chipq] $(date +%H:%M:%S) DONE $name exit=$?" | tee -a "$LOGDIR/status"
}

run act_ab 7200 python -u tools/probe_act_ab.py
run drawer_pair 5400 python -u tools/train_pair.py --task open_drawer \
    --out eval_artifacts --iters 6000 --save-freq 2000 --platform tpu
run protocol_eval 25200 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks put_item_in_drawer hand_over_item \
    --iters 6000 --save-freq 2000 --platform tpu
echo "[chipq] ALL DONE" | tee -a "$LOGDIR/status"
