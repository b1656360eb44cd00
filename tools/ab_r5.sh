#!/bin/bash
# Round-5 A/B matrix #1: the VERDICT-r4 evidence set, measurement-first.
#
#   * NOISE FLOOR (VERDICT r4 item 5): the same direct bs8 remat=full config
#     runs 3x, interleaved with forced-dw27 legs whose 4M chunk is a known
#     HBM OOM -> fallback to the no_dw27 rung (the SAME effective program as
#     the direct legs). If ladder legs disagree with direct legs beyond the
#     direct-vs-direct spread, the ladder leaves state behind; if the direct
#     legs themselves spread ~4%, that is the window noise and every sub-4%
#     round-4 claim needs repeat-leg error bars.
#   * DW27 CHUNK SWEEP (VERDICT r4 item 2 tail): does a 2M/1M chunk fit at
#     bs8 remat=full, and if so does it beat the XLA dW? Settles
#     ledger_r4_train_ceilings.md:61-70.
#   * bs16accum + anchors: the effective-bs16 number (VERDICT r4 item 3)
#     bracketed by bs1/SW anchor legs for cross-window comparability.
set -u
cd "$(dirname "$0")/.."
OUT=tools/ab_r5.jsonl
: > "$OUT"
run() {
  local name="$1"; shift
  echo "=== $name ($*) $(date +%H:%M:%S)" >&2
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

SW_ONLY="MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=0"
BS1_ONLY="MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=1 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=0"
BS8_ONLY="MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=1 MEDSEG_BENCH_TRAIN_BS16=0"
BS16_ONLY="MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=1"

run anchor_sw_pre   $SW_ONLY
run bs8_direct_a    $BS8_ONLY MEDSEG_BS8_REMAT=full
run bs8_dw27_c4     $BS8_ONLY MEDSEG_BS8_REMAT=full MEDSEG_DW27_PALLAS=1 MEDSEG_DW27_CHUNK=4000000
run bs8_direct_b    $BS8_ONLY MEDSEG_BS8_REMAT=full
run bs8_dw27_c2     $BS8_ONLY MEDSEG_BS8_REMAT=full MEDSEG_DW27_PALLAS=1 MEDSEG_DW27_CHUNK=2000000
run bs8_direct_c    $BS8_ONLY MEDSEG_BS8_REMAT=full
run bs8_dw27_c1     $BS8_ONLY MEDSEG_BS8_REMAT=full MEDSEG_DW27_PALLAS=1 MEDSEG_DW27_CHUNK=1000000
run bs16accum       $BS16_ONLY
run anchor_bs1      $BS1_ONLY
run anchor_sw_post  $SW_ONLY
echo done >&2
