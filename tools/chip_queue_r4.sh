#!/bin/bash
# Round-4 chip queue. Quick perf probes FIRST (they feed the CPU-side perf
# work for VERDICT #2/#3/#4/#7), then the long resumable protocol-eval
# capstone (VERDICT #1: open_drawer eval resume, open_jar nd-recipe retrain,
# put_item_in_drawer + hand_over_item fresh). bench.py runs are NOT queued —
# they follow the perf fixes, manually.
#
#   bash tools/chip_queue_r4.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq5}"
mkdir -p "$LOGDIR"

echo "[chipq] waiting for relay chip..." | tee "$LOGDIR/status"
until timeout 300 python -u -c "import jax; assert jax.devices()" \
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

# remat_ab DONE 2026-08-19 06:01 (/tmp/chipq5/remat_ab.log) — skipped on restart.
# b8 first (feeds the batching directive, the biggest perf item); timeouts are
# tight so a runaway probe cannot eat the protocol eval's window
run stage_b8 3600 python -u tools/profile_stages.py --batch 8
run stage_b1 3000 python -u tools/profile_stages.py
run sam_ab   3000 python -u tools/profile_sam.py
run protocol_eval 36000 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks open_drawer open_jar put_item_in_drawer hand_over_item \
    --iters 6000 --save-freq 2000 --platform tpu
echo "[chipq] ALL DONE" | tee -a "$LOGDIR/status"
