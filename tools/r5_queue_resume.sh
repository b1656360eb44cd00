#!/bin/bash
# Round-5 queue RESUME: the original tools/r5_queue.sh died with its parent
# session at ~07:15 UTC mid-leg (bs8_dw27_c4). anchor_sw_pre and bs8_direct_a
# completed into tools/ab_r5.jsonl; this script resumes from bs8_dw27_c4,
# APPENDING to ab_r5.jsonl (never truncating), then runs the rest of queue #1
# and queue #2 serially so one PID owns all TPU work.
# Start with: setsid nohup bash tools/r5_queue_resume.sh & echo $! > /tmp/r5_queue_resume.pid
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_queue.log
exec >>"$LOG" 2>&1

echo "=== r5 queue RESUME start $(date)"
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

ab() {
  local name="$1"; shift
  echo "=== $name ($*) $(date)"
  mkdir -p tools/ab_logs
  local line
  line=$(env "$@" MEDSEG_REQUIRE_TPU=1 PYTHONPATH="$PWD:${PYTHONPATH:-}" \
         timeout 2700 python bench.py 2>"tools/ab_logs/$name.log" | tail -1)
  if [ -n "$line" ]; then
    printf '{"config": "%s", "result": %s}\n' "$name" "$line" >> tools/ab_r5.jsonl
  else
    printf '{"config": "%s", "result": null}\n' "$name" >> tools/ab_r5.jsonl
    tail -3 "tools/ab_logs/$name.log"
  fi
}

run() {
  echo "=== $1 start $(date)"
  shift
  timeout 5400 "$@"
  echo "=== done rc=$? $(date)"
}

SW_ONLY="MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=0"
BS1_ONLY="MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=1 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=0"
BS8_ONLY="MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=1 MEDSEG_BENCH_TRAIN_BS16=0"
BS16_ONLY="MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=1"

# --- remaining ab_r5 legs (noise floor / dw27 chunk sweep / bs16accum) ---
ab bs8_dw27_c4     $BS8_ONLY MEDSEG_BS8_REMAT=full MEDSEG_DW27_PALLAS=1 MEDSEG_DW27_CHUNK=4000000
ab bs8_direct_b    $BS8_ONLY MEDSEG_BS8_REMAT=full
ab bs8_dw27_c2     $BS8_ONLY MEDSEG_BS8_REMAT=full MEDSEG_DW27_PALLAS=1 MEDSEG_DW27_CHUNK=2000000
ab bs8_direct_c    $BS8_ONLY MEDSEG_BS8_REMAT=full
ab bs8_dw27_c1     $BS8_ONLY MEDSEG_BS8_REMAT=full MEDSEG_DW27_PALLAS=1 MEDSEG_DW27_CHUNK=1000000
ab bs16accum       $BS16_ONLY
ab anchor_bs1      $BS1_ONLY
ab anchor_sw_post  $SW_ONLY

# --- rest of queue #1 ---
run ab_r4b bash tools/ab_r4b.sh
run profile_bs8 bash -c 'python tools/train_profile.py --bs 8 --remat full --steps 3 --top 60 > tools/ledger_r4_train_bs8.txt'
run convprobe python tools/probe_conv_layout.py
run zoo python tools/zoo_train_ab.py
run prodshapes bash -c 'python tools/val_production_shapes.py > tools/prod_shapes_r5.jsonl'
run bs16oom_full python tools/bs16_oom_probe.py full
run bs16oom_mixed python tools/bs16_oom_probe.py mixed
run hd95count python tools/hd95_compile_count.py

echo "=== r5 queue #1 complete $(date)"

# --- queue #2 (follow-ups) ---
run sw_fullvol bash -c 'python tools/sw_profile.py --full_volume --steps 2 --top 50 > tools/ledger_r5_sw_fullvol.txt'
run default_bench_timed bash -c '
  t0=$(date +%s)
  MEDSEG_REQUIRE_TPU=1 python bench.py > /tmp/bench_r5_default_out.json
  rc=$?
  t1=$(date +%s)
  echo "default bench rc=$rc wall=$((t1-t0))s"
  cat /tmp/bench_r5_default_out.json'

echo "=== r5 queue ALL complete $(date)"
