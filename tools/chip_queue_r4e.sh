#!/bin/bash
# Round-4 session-C queue, after the episode-latched target_object_pos fix
# (sim/environment.py): the per-frame tracked object position poisoned the
# training crop bounds for every task whose target MOVES (open_drawer /
# put_item_in_drawer: drawer_middle pulls ~20 cm; hand_over_item: the cube
# rides the arm 33 cm), teaching the policy trans targets in bounds eval never
# uses. open_jar's jar is static (verified 0.0 cm) so its 96% artifact stands.
# Retrain + full 3-stage protocol for the three affected tasks.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq12}"
mkdir -p "$LOGDIR"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "[chipq] $(date +%H:%M:%S) START $name" | tee -a "$LOGDIR/status"
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "[chipq] $(date +%H:%M:%S) DONE $name exit=$?" | tee -a "$LOGDIR/status"
}

run protocol_eval 36000 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks open_drawer put_item_in_drawer hand_over_item \
    --iters 6000 --save-freq 2000 --platform tpu
echo "[chipq] ALL DONE" | tee -a "$LOGDIR/status"
