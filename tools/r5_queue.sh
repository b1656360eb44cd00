#!/bin/bash
# Round-5 measurement queue: every TPU job runs SERIALLY through this one
# script — round 4 died because a background queue was still issuing TPU
# jobs during the driver's bench window. Start early in the round, monitor
# by log, and make sure it has FINISHED (or is killed by PID) well before
# round end so the driver owns the chip.
# Start with: bash tools/r5_queue.sh & echo $! > /tmp/r5_queue.pid
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_queue.log
exec >>"$LOG" 2>&1

echo "=== r5 queue start $(date)"

run() {
  echo "=== $1 start $(date)"
  shift
  timeout 5400 "$@"
  echo "=== done rc=$? $(date)"
}

export PYTHONPATH="$PWD:${PYTHONPATH:-}"

# 1. noise floor + dw27 chunk sweep + bs16accum + anchors
run ab_r5 bash tools/ab_r5.sh

# 2. loss-tail matrix (fused DiceCE at bs8 + anchors) — r4 queue item 1
run ab_r4b bash tools/ab_r4b.sh

# 3. train profile at the best-throughput batch for the train ceilings ledger
run profile_bs8 python tools/train_profile.py --bs 8 --remat full \
  --steps 3 --top 60 > tools/ledger_r4_train_bs8.txt

# 4. conv-layout copy probe (structural or fixable — train ledger input)
run convprobe python tools/probe_conv_layout.py

# 5. per-model zoo train/forward A/B (VERDICT r3 item 7)
run zoo python tools/zoo_train_ab.py

# 6. production-CT-shape validation probe (VERDICT r3 item 9)
run prodshapes python tools/val_production_shapes.py \
  > tools/prod_shapes_r5.jsonl

# 7. single-compile bs16 OOM byte-line capture (ledger_r4 TODO at line 26)
run bs16oom_full python tools/bs16_oom_probe.py full
run bs16oom_mixed python tools/bs16_oom_probe.py mixed

# 8. device-HD95 compile-count probe (VERDICT r4 item 10)
run hd95count python tools/hd95_compile_count.py

echo "=== r5 queue complete $(date)"
