#!/bin/bash
# Round-4 A/B matrix #2: loss-tail and follow-up legs, run AFTER ab_r4.sh.
#
#   * The C=14 fp32 logits tensor is lane-padded 128/14 = 9.14x, so every
#     full pass over it costs ~4.1 GB of physical HBM traffic at bs8. The
#     round-2 fused Pallas DiceCE (ops/pallas/dice_ce.py) was NEUTRAL at
#     bs1 (the kernel boundary un-fused the metric tail); at bs8 the tail
#     is 8x bigger — re-measure at the large-batch operating point.
#   * anchor legs bracket the window like ab_r4.sh.
set -u
cd "$(dirname "$0")/.."
OUT=tools/ab_r4b.jsonl
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

TRAIN_OFF="MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=0"
BS1_ONLY="MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=1 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=0"
BS8_ONLY="MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=1 MEDSEG_BENCH_TRAIN_BS16=0"

run anchor_bs1_pre  $BS1_ONLY
run bs8_base        $BS8_ONLY MEDSEG_BS8_REMAT=full
run bs8_fusedloss   $BS8_ONLY MEDSEG_BS8_REMAT=full MEDSEG_FUSED_LOSS=1
run bs1_fusedloss   $BS1_ONLY MEDSEG_FUSED_LOSS=1
run anchor_bs1_post $BS1_ONLY
echo done >&2
