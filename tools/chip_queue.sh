#!/bin/bash
# Chip-window queue: run every chip-gated round-3 item sequentially the moment
# the relay TPU answers. Never overlaps TPU processes (relay is single-tenant).
#
#   bash tools/chip_queue.sh [logdir]
#
# Quick probes go FIRST: if the relay flaps, a short window still yields the
# perf evidence; the protocol eval resumes across windows via its own guard.
#   0. poll until jax.devices() answers on the relay
#   1. decoder_head v3 probe (A/B vs v1/v2; auto-flips the bench flag on a win)
#   2. honest remat A/B (profile_train fetches an in-region scalar probe)
#   3. vlm_ms_per_frame + sam_h probes (bench VLM section, visible tracebacks)
#   4. full bench with the probe-chosen v3 flag -> BENCH_r3 numbers
#   5. protocol-eval capstone: train+sweep open_drawer / put_item_in_drawer /
#      hand_over_item (resume guard skips finished policies)
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/chipq}"
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

run v3_probe 2400 python -u tools/probe_decoder_ab.py
V3=$(python - "$LOGDIR/v3_probe.log" <<'PYEOF'
import json, sys
try:
    lines = open(sys.argv[1]).read().splitlines()
    ok = any("v3 argmax == v1: True" in l for l in lines)
    d = json.loads([l for l in lines if l.startswith("{")][-1])
    print(1 if ok and "v3" in d and d["v3"] < min(d.get("v1", 9e9),
                                                  d.get("v2", 9e9)) else 0)
except Exception:
    print(0)
PYEOF
)
echo "[chipq] v3 bench flag -> $V3" | tee -a "$LOGDIR/status"

run front_probe 2400 python -u tools/probe_front_batch.py
run remat_ab 2400 python -u tools/profile_train.py --steps 8
run vlm_probe 2400 python -u -c "import bench; print('vlm_ms:', bench.time_vlm_pass()); print('sam_h_ms:', bench.time_sam_h())"
run protocol_eval 28800 python -u tools/run_protocol_eval.py --out eval_artifacts \
    --tasks open_drawer put_item_in_drawer hand_over_item \
    --iters 6000 --save-freq 2000 --platform tpu
run bench_full 5400 env BENCH_PALLAS_DECODER_V3="$V3" python -u bench.py
echo "[chipq] ALL DONE" | tee -a "$LOGDIR/status"
