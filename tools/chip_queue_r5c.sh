#!/bin/bash
# Round-5 session-B queue, reprioritized after the live-probe diagnosis.
#
# The r5b queue's hand_over_item retrain (new rig + deterministic crop-frame
# geometry) still scored 0-4% val: probe_replay_accuracy 0.988 exact-match but
# probe_policy_open_loop --live shows both arms looping — the giver skips to
# 'withdraw' the moment it sees the receiver hovering at the meet point,
# because the demo ran all assistive waypoints before all dominant ones while
# the eval rollout strictly alternates (rollout_generator.py:233-244). Fixed
# by interleaving the task's waypoints a,d,a,d (sim/tasks.py HandOverItem).
# This queue runs the retrain on that geometry FIRST, then the rest of the
# round-5 items in VERDICT priority order. Same hardening as r5b: TPU health
# gate, stall watchdog, kill-by-PID retries.
#
# Usage: chip_queue_r5c.sh [LOGDIR] [WAIT_PID]
#   WAIT_PID: a still-running protocol child from the previous queue; we wait
#   for it to exit before claiming the chip (two TPU processes wedge the relay).
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq15c}"
WAIT_PID="${2:-}"
STALL_S="${STALL_S:-1200}"
# refuse to START new items after this epoch so the chip is free for the
# round-end driver bench (items already running still finish)
DEADLINE_EPOCH="${DEADLINE_EPOCH:-0}"
mkdir -p "$LOGDIR"

if [ -n "$WAIT_PID" ]; then
  echo "[chipq] waiting for pid $WAIT_PID to finish its chip work" \
    | tee -a "$LOGDIR/status"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[chipq] $(date +%H:%M:%S) pid $WAIT_PID exited" | tee -a "$LOGDIR/status"
fi

# archive the superseded hand_over_item artifact (waypoint order changed —
# old checkpoints/replay are for different demos; the retrain must be fresh)
python - <<'EOF' | tee -a "$LOGDIR/status"
import json, os, shutil
src = "eval_artifacts/hand_over_item"
dst = "eval_artifacts/hand_over_item_r5a"
if os.path.isdir(src) and not os.path.isdir(dst):
    shutil.move(src, dst)
    p = "eval_artifacts/summary.json"
    s = json.load(open(p))
    if "hand_over_item" in s:
        e = s.pop("hand_over_item")
        e["acting_dir"] = e.get("acting_dir", "").replace(src, dst)
        e["note"] = (
            "round-5 session-A run (new rig + deterministic crop-frame "
            "geometry), SUPERSEDED: demo waypoints ran all assistive moves "
            "before all dominant ones while the eval rollout strictly "
            "alternates; the giver policy keys its stage off the receiver's "
            "position, so at eval it saw an end-of-demo context on turn 2 and "
            "skipped to 'withdraw' (probe_policy_open_loop --live; replay "
            "exact-match 0.988, val 0-4%). Retrained with a,d,a,d-interleaved "
            "waypoints (sim/tasks.py).")
        s["hand_over_item_r5a"] = e
        json.dump(s, open(p, "w"), indent=1)
        print("[chipq] archived hand_over_item -> hand_over_item_r5a")
EOF

( while true; do
    ps -eo rss,comm --sort=-rss | awk 'NR==2 {printf "%s %d MB %s\n", strftime("%H:%M:%S"), $1/1024, $2}'
    sleep 30
  done ) >> "$LOGDIR/rss.log" 2>&1 &
WATCHDOG=$!
trap 'kill $WATCHDOG 2>/dev/null' EXIT

newest_mtime() {
  { stat -c %Y "$1" 2>/dev/null
    find eval_artifacts -name "*.csv" -o -name "*.json" 2>/dev/null \
      | xargs -r stat -c %Y 2>/dev/null | sort -n | tail -1
  } | sort -n | tail -1
}

run() {
  local name="$1" tmo="$2"; shift 2
  if [ "$DEADLINE_EPOCH" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; then
    echo "[chipq] $(date +%H:%M:%S) SKIP $name: past deadline" \
      | tee -a "$LOGDIR/status"
    return 1
  fi
  local tries=0
  while [ $tries -lt 3 ]; do
    tries=$((tries + 1))
    echo "[chipq] $(date +%H:%M:%S) START $name (try $tries)" | tee -a "$LOGDIR/status"
    bash tools/tpu_health_wait.sh "$LOGDIR/health.log" 7200 || {
      echo "[chipq] $(date +%H:%M:%S) ABORT $name: TPU never recovered" | tee -a "$LOGDIR/status"
      return 1
    }
    sleep 30
    timeout "$tmo" "$@" >> "$LOGDIR/$name.log" 2>&1 &
    local pid=$!
    local stalled=0
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local last now
      last=$(newest_mtime "$LOGDIR/$name.log"); now=$(date +%s)
      if [ -n "$last" ] && [ $((now - last)) -gt "$STALL_S" ]; then
        echo "[chipq] $(date +%H:%M:%S) STALL $name (no writes ${STALL_S}s) — killing $pid" \
          | tee -a "$LOGDIR/status"
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        stalled=1
        break
      fi
    done
    wait "$pid" 2>/dev/null
    local rc=$?
    if [ "$stalled" = 0 ] && [ "$rc" = 0 ]; then
      echo "[chipq] $(date +%H:%M:%S) DONE $name exit=0" | tee -a "$LOGDIR/status"
      return 0
    fi
    if [ "$stalled" = 0 ]; then
      echo "[chipq] $(date +%H:%M:%S) FAIL $name exit=$rc — retrying" \
        | tee -a "$LOGDIR/status"
      sleep 120
    fi
  done
  echo "[chipq] GIVE-UP $name after $tries tries" | tee -a "$LOGDIR/status"
  return 1
}

run hand_over2 10800 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks hand_over_item --iters 6000 --save-freq 2000 --platform tpu
run put_item 10800 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks put_item_in_drawer --iters 6000 --save-freq 2000 --platform tpu
run vlm_eval 10800 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks open_jar open_drawer hand_over_item put_item_in_drawer \
    --vlm-eval --platform tpu
run train_ab 5400 python -u tools/profile_train.py
run train_bwd 5400 python -u tools/profile_train.py --bwd-split
run stages_b8 5400 python -u tools/profile_stages.py --batch 8
run sam_stage 5400 python -u tools/profile_sam.py --stage
run bench_full 7200 python -u bench.py
echo "[chipq] ALL DONE" | tee -a "$LOGDIR/status"
