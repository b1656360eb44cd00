#!/bin/bash
# Round-4 post-matrix TPU queue: waits for the ab_r4.sh matrix (PID file),
# then runs the remaining single-JAX-process measurement jobs serially.
# Start with: bash tools/r4_queue.sh & echo $! > /tmp/r4_queue.pid
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_queue.log
exec >>"$LOG" 2>&1

echo "=== r4 queue start $(date)"
# wait for the A/B matrix to finish (poll its PID)
if [ -f /tmp/ab_r4.pid ]; then
  while kill -0 "$(cat /tmp/ab_r4.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== matrix done $(date)"

run() {
  echo "=== $1 start $(date)"
  shift
  timeout 5400 "$@"
  echo "=== done rc=$? $(date)"
}

export PYTHONPATH="$PWD:${PYTHONPATH:-}"

# 1. loss-tail matrix (fused DiceCE at bs8 + anchors)
run ab_r4b bash tools/ab_r4b.sh

# 2. per-model zoo train/forward A/B (VERDICT r3 item 7)
run zoo python tools/zoo_train_ab.py

# 3. production-CT-shape validation probe (VERDICT r3 item 9)
run prodshapes python tools/val_production_shapes.py \
  > tools/prod_shapes_r4.jsonl

# 4. conv-layout copy probe (structural or fixable — r4 train ledger input)
run convprobe python tools/probe_conv_layout.py

# 5. train profile at the best-throughput batch for the r4 ceilings ledger
run profile_bs8 python tools/train_profile.py --bs 8 --remat full \
  --steps 3 --top 60 > tools/ledger_r4_train_bs8.txt

# 6. focused bs8 legs with dw27 FORCED ON under the new failure logging:
#    the OOM/reject text (exact HBM bytes) is the VERDICT item-3 evidence;
#    the chunk sweep tests whether a smaller per-call footprint fits
for CH in 4000000 2000000 1000000; do
  run "bs8_dw27_chunk$CH" env MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 \
    MEDSEG_BENCH_TRAIN_BS8=1 MEDSEG_BS8_REMAT=full MEDSEG_DW27_PALLAS=1 \
    MEDSEG_DW27_CHUNK=$CH MEDSEG_BENCH_TRAIN_BS16=0 MEDSEG_REQUIRE_TPU=1 \
    python bench.py
done
echo "=== r4 queue complete $(date)"
