#!/bin/bash
# Round-5 A/B matrix #3 (post-queue): the SW-harvest attempt (VERDICT r4
# item 4). Same-window legs:
#   * anchor/classmajor/anchor: does the class-major logits path
#     (MEDSEG_SW_CLASSMAJOR=1 — skips the lane-padded (16,96^3,14)
#     materialization + transpose in the blend, decoders.py UnetOutBlock)
#     move the SW headline?
#   * probe_pad_fusion: the decoder0 pad_maximum formulation A/B
#     (ledger_r3_sw_ceilings.md's only identified-headroom bucket).
# Run ONLY after tools/r5_queue_resume.sh has finished (serial TPU use).
set -u
cd "$(dirname "$0")/.."
OUT=tools/ab_r5.jsonl
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

# ab_r4b's 5400s timeout expired mid-matrix (the bs8_fusedloss OOM ladder ate
# ~50 min of doomed compiles); recover its two lost legs here.
run bs1_fusedloss     $BS1_ONLY MEDSEG_FUSED_LOSS=1
run anchor_bs1_post4b $BS1_ONLY

# GCViT pallas-train leg threw ValueError in the main zoo run before the
# error-message capture landed; re-run with messages recorded. Then catch up
# any zoo models the main run's 5400s timeout cut off (one at a time so a
# slow compile only costs its own slot).
echo "=== zoo_gcvit_retry $(date +%H:%M:%S)" >&2
PYTHONPATH="$PWD:${PYTHONPATH:-}" timeout 2700 python tools/zoo_train_ab.py \
  GCViTUNETR >> tools/ab_logs/zoo_gcvit_retry.log 2>&1 || true
for m in SegFormer3D FocalNetUNETR SwinUNETR_Official nnFormer; do
  if ! grep -q "\"model\": \"$m\"" tools/zoo_train_ab.jsonl 2>/dev/null; then
    echo "=== zoo_catchup $m $(date +%H:%M:%S)" >&2
    PYTHONPATH="$PWD:${PYTHONPATH:-}" timeout 2700 python tools/zoo_train_ab.py \
      "$m" >> "tools/ab_logs/zoo_catchup_$m.log" 2>&1 || true
  fi
done

run anchor_sw_r5c_a   $SW_ONLY
run sw_classmajor     $SW_ONLY MEDSEG_SW_CLASSMAJOR=1
run anchor_sw_r5c_b   $SW_ONLY
run sw_classmajor_b   $SW_ONLY MEDSEG_SW_CLASSMAJOR=1

echo "=== probe_pad_fusion $(date +%H:%M:%S)" >&2
PYTHONPATH="$PWD:${PYTHONPATH:-}" timeout 2700 python tools/probe_pad_fusion.py \
  > tools/probe_pad_fusion_r5.txt 2>&1
echo done >&2
