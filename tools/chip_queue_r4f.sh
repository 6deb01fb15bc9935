#!/bin/bash
# Round-4 session-C follow-on (after chipq12's protocol eval):
#   1. decoder-tail part attribution (nostats/notrans/tap1/dma ablations) —
#      decides where the v4 schedule effort goes.
#   2. front-unroll width sweep at the two operating points (the act_ab showed
#      unroll8 winning; is 16/25 better? plane-split width is a free knob).
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq13}"
mkdir -p "$LOGDIR"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "[chipq] $(date +%H:%M:%S) START $name" | tee -a "$LOGDIR/status"
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "[chipq] $(date +%H:%M:%S) DONE $name exit=$?" | tee -a "$LOGDIR/status"
}

run decoder_parts 3600 python -u tools/probe_decoder_parts.py --n 100
echo "[chipq] ALL DONE" | tee -a "$LOGDIR/status"
