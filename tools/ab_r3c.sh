#!/bin/bash
# Third round-3 batch: min-based timing for the conv-formulation +
# optimizer legs, then the per-op roofline ledgers (the first ledger run
# crashed on the hsplit lowering bug, since fixed).
set -u
cd "$(dirname "$0")/.."
OUT=tools/ab_r3c.jsonl
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
run train_flatopt2        MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_FLAT_OPT=1
run train_dw27pallas2     MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_DW27_PALLAS=1
run train_bs4_dw27pallas2 MEDSEG_BENCH_SW=0 MEDSEG_DW27_PALLAS=1
run sw_baseline2          MEDSEG_BENCH_TRAIN=0
run sw_winograd3          MEDSEG_BENCH_TRAIN=0 MEDSEG_WINOGRAD=1
run sw_fused_decoder3     MEDSEG_BENCH_TRAIN=0 MEDSEG_FUSED_DECODER=1
run sw_fused_wino3        MEDSEG_BENCH_TRAIN=0 MEDSEG_FUSED_DECODER=1 MEDSEG_WINOGRAD=1

env PYTHONPATH="$PWD:${PYTHONPATH:-}" timeout 2700 \
  python tools/train_profile.py --bs 1 --steps 3 --pallas_train \
  > tools/ledger_r3_train_bs1.txt 2>&1 || true
env PYTHONPATH="$PWD:${PYTHONPATH:-}" timeout 2700 \
  python tools/sw_profile.py --steps 2 \
  > tools/ledger_r3_sw.txt 2>&1 || true
echo done >&2
