#!/bin/bash
# Round-4 session-C queue, take 3. The r4e run thrashed at 124 GB RSS during
# its FIFTH in-process training leg (hand_over_item dominant, ~55 min stuck at
# step 1800) — so each task now runs in its OWN process, with an RSS watchdog
# logging memory every 30 s to attribute the growth. put_item_in_drawer
# retrains with the role-swap fix (assistive opens the drawer, dominant places
# the item — put_item_in_drawer.py:38-41); its swapped-role artifact moved to
# put_item_in_drawer_r4b. After the protocol: the decoder-tail part probe.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq13}"
mkdir -p "$LOGDIR"

( while true; do
    ps -eo rss,comm --sort=-rss | awk 'NR==2 {printf "%s %d MB %s\n", strftime("%H:%M:%S"), $1/1024, $2}'
    sleep 30
  done ) >> "$LOGDIR/rss.log" 2>&1 &
WATCHDOG=$!

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
run decoder_parts 3600 python -u tools/probe_decoder_parts.py --n 100
kill $WATCHDOG 2>/dev/null
echo "[chipq] ALL DONE" | tee -a "$LOGDIR/status"
