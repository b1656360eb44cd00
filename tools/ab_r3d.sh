#!/bin/bash
# Fourth round-3 batch: winograd/fused-decoder at sw_batch 8 (sw_batch 16 +
# the lane-padded phase arrays OOMs HBM by 44MB), auto-dw27 confirmations,
# bs8 with the auto dW kernel.
set -u
cd "$(dirname "$0")/.."
OUT=tools/ab_r3d.jsonl
: > "$OUT"
run() {
  local name="$1"; shift
  echo "=== $name ($*)" >&2
  mkdir -p tools/ab_logs
  local line
  line=$(env "$@" MEDSEG_REQUIRE_TPU=1 PYTHONPATH="$PWD:${PYTHONPATH:-}" \
         timeout 2700 python bench.py 2>"tools/ab_logs/$name.log" | tail -1)
  if [ -n "$line" ]; then
    printf '{"config": "%s", "result": %s}\n' "$name" "$line" >> "$OUT"
  else
    printf '{"config": "%s", "result": null}\n' "$name" >> "$OUT"
    tail -3 "tools/ab_logs/$name.log" >&2
  fi
}
run sw_batch8_base2   MEDSEG_BENCH_TRAIN=0 MEDSEG_SW_BATCH=8
run sw_batch8_wino    MEDSEG_BENCH_TRAIN=0 MEDSEG_SW_BATCH=8 MEDSEG_WINOGRAD=1
run sw_batch8_fusedec MEDSEG_BENCH_TRAIN=0 MEDSEG_SW_BATCH=8 MEDSEG_FUSED_DECODER=1
run sw_batch8_fw      MEDSEG_BENCH_TRAIN=0 MEDSEG_SW_BATCH=8 MEDSEG_FUSED_DECODER=1 MEDSEG_WINOGRAD=1
run train_bs4_auto    MEDSEG_BENCH_SW=0
run train_bs8_auto    MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=1
echo done >&2
