#!/bin/bash
# Round-4 session-D queue (fresh host, /tmp wiped, compile cache cold).
# Finishes VERDICT #1: the two remaining capstone tasks, each in its OWN
# process (the r4e in-process multi-leg run thrashed at 124 GB RSS), with an
# RSS watchdog. hand_over_item starts from scratch (the stale 1800-step
# partial leg was removed); put_item_in_drawer retrains with the role-split
# fix (assistive opens the drawer, dominant places the item). After the
# protocol: the flag-gated front one-hot MXU-matmul scatter A/B
# (BENCH_FRONT_MATMUL decision), the decoder-tail part probe, and a full
# bench for interim round-4 numbers.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq14}"
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

run hand_over 10800 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks hand_over_item --iters 6000 --save-freq 2000 --platform tpu
run put_item 10800 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks put_item_in_drawer --iters 6000 --save-freq 2000 --platform tpu
run front_matmul 3600 python -u tools/probe_front_matmul.py
run decoder_parts 3600 python -u tools/probe_decoder_parts.py --n 100
run bench_full 5400 python -u bench.py
kill $WATCHDOG 2>/dev/null
echo "[chipq] ALL DONE" | tee -a "$LOGDIR/status"
