#!/bin/bash
# Fifth round-3 batch: the mixed remat policy at bs8 (vs the full-remat
# baseline, same window) + a bs16 probe. SW legs off (settled).
set -u
cd "$(dirname "$0")/.."
OUT=tools/ab_r3e.jsonl
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
run bs8_mixed MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=1 MEDSEG_BS8_REMAT=mixed
run bs8_full  MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=1 MEDSEG_BS8_REMAT=full
run bs16_mixed MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=1
echo done >&2
