#!/bin/bash
# Round-4 A/B matrix #1: the large-batch training campaign (VERDICT r3
# items 1, 3, 4).
#
#   * anchor_* legs re-run the EXACT round-3 headline configs (bs1
#     pallas+absorb remat=conv; SW sw_batch 16 absorbed) FIRST and LAST, so
#     every cross-leg delta in this file is a same-window measurement and
#     round-over-round claims anchor on measured legs, not on r3 numbers
#     taken in a different tunnel-drift window.
#   * bs8_full_nodw27 reproduces the round-3 bs8 configuration (the dw27
#     kernel was gated out above 4M voxels then) — the bs8 cross-round
#     anchor.
#   * bs8_full / bs8_mixed / bs16_mixed / bs16_full carry the new
#     batch-chunked Pallas dW (ops/convgrad.py _dw27_pallas_chunked);
#     bs16_mixed_nodw27 isolates the kernel's effect at bs16.
set -u
cd "$(dirname "$0")/.."
OUT=tools/ab_r4.jsonl
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

run anchor_bs1_pre  MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=1 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=0
run anchor_sw_pre   MEDSEG_BENCH_SW=1 $TRAIN_OFF
run bs8_full_nodw27 MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=1 MEDSEG_BS8_REMAT=full MEDSEG_DW27_PALLAS=0 MEDSEG_BENCH_TRAIN_BS16=0
run bs8_full        MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=1 MEDSEG_BS8_REMAT=full MEDSEG_BENCH_TRAIN_BS16=0
run bs8_mixed       MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=1 MEDSEG_BS8_REMAT=mixed MEDSEG_BENCH_TRAIN_BS16=0
run bs16_mixed      MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=1 MEDSEG_BS16_REMAT=mixed
run bs16_full       MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=1 MEDSEG_BS16_REMAT=full
run bs16_mixed_nodw27 MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=1 MEDSEG_BS16_REMAT=mixed MEDSEG_DW27_PALLAS=0
run bs4_dw27_chunk  MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=1 MEDSEG_BENCH_TRAIN_BS4=1 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=0
# VERDICT r3 item 8: flat-buffer AdamW in its new fused_apply form, vs the
# same-window anchor_bs1 legs (per-leaf optax) and at the bs8 operating point.
run bs1_flatopt     MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=1 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=0 MEDSEG_FLAT_OPT=1
run bs8_flatopt     MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=1 MEDSEG_BS8_REMAT=full MEDSEG_BENCH_TRAIN_BS16=0 MEDSEG_FLAT_OPT=1
run anchor_bs1_post MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=1 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=0
run anchor_sw_post  MEDSEG_BENCH_SW=1 $TRAIN_OFF
echo done >&2
