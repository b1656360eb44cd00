#!/bin/bash
# Round-3 A/B matrix on the real TPU chip. Run unattended when the axon
# tunnel is up; one JSON line per configuration lands in tools/ab_r3.jsonl.
#
#   SW (inference):  baseline | fused decoder (winograd+IN epilogue) |
#                    winograd primal | fused decoder + winograd primal
#   train (bs1):     baseline | winograd train | dots27 train
#
# Each variant is its own process (the MEDSEG_* gates are read at import).
set -u
cd "$(dirname "$0")/.."
OUT=tools/ab_r3.jsonl
: > "$OUT"

run() {
  local name="$1"; shift
  echo "=== $name ($*)" >&2
  local line
  # stderr per config -> tools/ab_logs/ so a null result is diagnosable
  mkdir -p tools/ab_logs
  line=$(env MEDSEG_BENCH_TRAIN_BS8=0 "$@" MEDSEG_REQUIRE_TPU=1 PYTHONPATH="$PWD:${PYTHONPATH:-}" \
         timeout 2700 python bench.py 2>"tools/ab_logs/$name.log" | tail -1)
  if [ -n "$line" ]; then
    printf '{"config": "%s", "result": %s}\n' "$name" "$line" >> "$OUT"
  else
    printf '{"config": "%s", "result": null}\n' "$name" >> "$OUT"
    tail -5 "tools/ab_logs/$name.log" >&2
  fi
}

# --- headline configs first (tunnel flaps mid-matrix lose the tail) ---
run sw_baseline               MEDSEG_BENCH_TRAIN=0
run train_baseline            MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0

# --- sliding-window A/B (skip the train bench for speed) ---
run sw_noabsorb               MEDSEG_BENCH_TRAIN=0 MEDSEG_ABSORB=0
run sw_fused_decoder          MEDSEG_BENCH_TRAIN=0 MEDSEG_FUSED_DECODER=1
run sw_winograd               MEDSEG_BENCH_TRAIN=0 MEDSEG_WINOGRAD=1
run sw_fused_plus_winograd    MEDSEG_BENCH_TRAIN=0 MEDSEG_FUSED_DECODER=1 MEDSEG_WINOGRAD=1

# --- sw_batch re-sweep with the absorbed (smaller) window program ---
run sw_batch8                 MEDSEG_BENCH_TRAIN=0 MEDSEG_SW_BATCH=8
run sw_batch24                MEDSEG_BENCH_TRAIN=0 MEDSEG_SW_BATCH=24
run sw_batch32                MEDSEG_BENCH_TRAIN=0 MEDSEG_SW_BATCH=32

# --- train-step A/B (SW bench skipped via MEDSEG_BENCH_SW=0) ---
run train_noabsorb            MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_ABSORB=0
run train_nopatchify          MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_PATCHIFY_TRAIN=0
run train_flatopt             MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_FLAT_OPT=1
run train_nohsplit            MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_HSPLIT=0
run train_winograd            MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_WINOGRAD_TRAIN=1
run train_dots27              MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_DOTS27_TRAIN=1
run train_dw27pallas          MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_DW27_PALLAS=1

# --- bs4 batch scaling (VERDICT r2 #4): baseline vs one-pass Pallas dW ---
run train_bs4_baseline        MEDSEG_BENCH_SW=0
run train_bs4_dw27pallas      MEDSEG_BENCH_SW=0 MEDSEG_DW27_PALLAS=1

# --- bs8 under full-block remat (bs8 @ remat=conv is an HBM OOM) ---
run train_bs8_rematfull       MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=1

# --- per-op roofline ledgers at the production config (LEDGER.md input) ---
env PYTHONPATH="$PWD:${PYTHONPATH:-}" timeout 2700 \
  python tools/train_profile.py --bs 1 --steps 3 --pallas_train \
  > tools/ledger_r3_train_bs1.txt 2>&1 || true
env PYTHONPATH="$PWD:${PYTHONPATH:-}" timeout 2700 \
  python tools/sw_profile.py --steps 2 \
  > tools/ledger_r3_sw.txt 2>&1 || true

echo "done; results in $OUT" >&2
