#!/bin/bash
# Round-3 follow-up A/B: train configs back-to-back in ONE time window
# (the first matrix's train numbers spanned 90 min of tunnel drift), with
# the fixed head-split backward, plus the winograd SW configs the fixed
# DMA alignment unblocks.
set -u
cd "$(dirname "$0")/.."
OUT=tools/ab_r3b.jsonl
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
run train_hsplit     MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0
run train_nohsplit2  MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_HSPLIT=0
run train_noabsorb2  MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_ABSORB=0
run train_nopallas2  MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_BENCH_PALLAS=0
run train_bs4_hsplit MEDSEG_BENCH_SW=0
run sw_winograd2     MEDSEG_BENCH_TRAIN=0 MEDSEG_WINOGRAD=1
run sw_fused_decoder2 MEDSEG_BENCH_TRAIN=0 MEDSEG_FUSED_DECODER=1
run train_bs8_rematfull2 MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=1
echo done >&2
