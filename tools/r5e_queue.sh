#!/bin/bash
# Round-5 queue #5 ("r5e"): post-fix follow-ups. Run ONLY after r5d_queue.sh
# has finished (serial TPU use).
#   * GC-ViT zoo retry: the r5d zoo leg found the fused path broken on
#     hardware (Mosaic gather rejection in _global_kernel, window_attention
#     .py:750 — a (newaxis, slice, slice) index tuple lowering to
#     lax.gather). Re-measure all four legs with the fix.
# Start: bash tools/r5e_queue.sh & echo $! > /tmp/r5e.pid
set -u
cd "$(dirname "$0")/.."
LOG=tools/ab_logs/r5e_queue.log
exec >>"$LOG" 2>&1

echo "=== r5e queue start $(date)"
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

echo "=== zoo_GCViTUNETR_fixed start $(date)"
timeout 2700 python tools/zoo_train_ab.py GCViTUNETR \
  2>> tools/ab_logs/zoo_GCViTUNETR_fixed.log
echo "=== zoo_GCViTUNETR_fixed done rc=$? $(date)"

echo "=== r5e queue ALL complete $(date)"
touch /tmp/r5e.done
