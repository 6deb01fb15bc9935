#!/bin/bash
# Round-5 session-A queue. Order:
#  1-2. retrain + full protocol for the two failing capstone tasks
#       (VERDICT r4 #1/#2) on the FRONT+WRIST 64x64 rig (the overnight r4d
#       queue raced the rig fix: it trained on the superseded wrist-only
#       32x32 rig) and, for hand_over_item, on the de-mirrored
#       crop-deterministic waypoints (probe_replay_accuracy on the r4d leg:
#       trans_exact 0.30 with |dt|=9 mirror misses; replay-ambiguity probe
#       on the new rig+geometry: 0 conflicting pairs, oracle 1.00).
#  3.   VLM-in-loop eval (VERDICT r4 #3): pixels-derived crops on all four
#       tasks' protocol artifacts -> <task>_vlmcrop summary entries.
#  4-6. perf attribution: SAM stage ladder (VERDICT #5), train bwd split
#       (VERDICT #6), batched stage table re-measure (VERDICT #4).
#  7.   full bench for the round-5 interim numbers.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq15}"
mkdir -p "$LOGDIR"

( while true; do
    ps -eo rss,comm --sort=-rss | awk 'NR==2 {printf "%s %d MB %s\n", strftime("%H:%M:%S"), $1/1024, $2}'
    sleep 30
  done ) >> "$LOGDIR/rss.log" 2>&1 &
WATCHDOG=$!
trap 'kill $WATCHDOG 2>/dev/null' EXIT

run() {
  local name="$1" tmo="$2"; shift 2
  echo "[chipq] $(date +%H:%M:%S) START $name" | tee -a "$LOGDIR/status"
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "[chipq] $(date +%H:%M:%S) DONE $name exit=$?" | tee -a "$LOGDIR/status"
}

run hand_over 14400 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks hand_over_item --iters 6000 --save-freq 2000 --platform tpu
run put_item 14400 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks put_item_in_drawer --iters 6000 --save-freq 2000 --platform tpu
run vlm_eval 14400 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks open_jar open_drawer hand_over_item put_item_in_drawer \
    --vlm-eval --platform tpu
run sam_stage 5400 python -u tools/profile_sam.py --stage
run train_bwd 5400 python -u tools/profile_train.py --bwd-split
run stages_b8 5400 python -u tools/profile_stages.py --batch 8
run bench_full 7200 python -u bench.py
echo "[chipq] ALL DONE" | tee -a "$LOGDIR/status"
