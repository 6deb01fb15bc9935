#!/bin/bash
# Round-5 session-A restart queue: same items as chip_queue_r5a.sh, hardened
# against the relay wedge that killed the first run (assistive hand_over leg
# froze mid-RPC at step 3900; every thread futex-parked, 0% CPU — see
# tools/ROUND5_PLAN.md "Platform notes"). Changes vs r5a:
#   - waits for TPU health (tools/tpu_health_wait.sh) before the queue and
#     before every retry;
#   - each item runs under a stall watchdog: if neither its log nor anything
#     under eval_artifacts/ has been written for STALL_S seconds, the item is
#     killed BY PID and retried (resume logic in run_protocol_eval/cli.train
#     picks up from the last checkpoint, so a retry costs at most one leg);
#   - two retries per item, then move on so one bad item can't eat the round.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq15b}"
STALL_S="${STALL_S:-1200}"
mkdir -p "$LOGDIR"

( while true; do
    ps -eo rss,comm --sort=-rss | awk 'NR==2 {printf "%s %d MB %s\n", strftime("%H:%M:%S"), $1/1024, $2}'
    sleep 30
  done ) >> "$LOGDIR/rss.log" 2>&1 &
WATCHDOG=$!
trap 'kill $WATCHDOG 2>/dev/null' EXIT

newest_mtime() {
  # newest mtime (epoch) across the item log and the artifact tree
  { stat -c %Y "$1" 2>/dev/null
    find eval_artifacts -name "*.csv" -o -name "*.json" 2>/dev/null \
      | xargs -r stat -c %Y 2>/dev/null | sort -n | tail -1
  } | sort -n | tail -1
}

run() {
  local name="$1" tmo="$2"; shift 2
  local tries=0
  while [ $tries -lt 3 ]; do
    tries=$((tries + 1))
    echo "[chipq] $(date +%H:%M:%S) START $name (try $tries)" | tee -a "$LOGDIR/status"
    bash tools/tpu_health_wait.sh "$LOGDIR/health.log" 7200 || {
      echo "[chipq] $(date +%H:%M:%S) ABORT $name: TPU never recovered" | tee -a "$LOGDIR/status"
      return 1
    }
    sleep 30  # let the probe's pool claim fully release before the next claim
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
    # nonzero exit without a stall (e.g. FAILED_PRECONDITION right after a
    # wedge recovery, when the pool chip needs settling time before the next
    # claim) is retryable the same way a stall is — loop back through the
    # health gate after a pause
    if [ "$stalled" = 0 ]; then
      echo "[chipq] $(date +%H:%M:%S) FAIL $name exit=$rc — retrying" \
        | tee -a "$LOGDIR/status"
      sleep 120
    fi
  done
  echo "[chipq] $(date +%H:%M:%S) GIVE-UP $name after $tries tries" | tee -a "$LOGDIR/status"
  return 1
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
