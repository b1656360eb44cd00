#!/bin/bash
# Round-5 measurement queue #2: follow-ups that depend on queue #1's
# results. Run ONLY after tools/r5_queue.sh has finished (serial TPU use).
# Start with: bash tools/r5_queue2.sh & echo $! > /tmp/r5_queue2.pid
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_queue2.log
exec >>"$LOG" 2>&1

echo "=== r5 queue2 start $(date)"

run() {
  echo "=== $1 start $(date)"
  shift
  timeout 5400 "$@"
  echo "=== done rc=$? $(date)"
}

export PYTHONPATH="$PWD:${PYTHONPATH:-}"

# 1. whole-volume SW profile: explain the ~60 ms/volume of non-predictor
#    device time (r3 ledger predicts 1.235 vol/s from 2 predictor steps;
#    bench measures 1.136-1.146). Input to VERDICT r4 item 4.
run sw_fullvol python tools/sw_profile.py --full_volume --steps 2 --top 50 \
  > tools/ledger_r5_sw_fullvol.txt

# 2. the VERDICT r4 item-1 "fits in budget" proof: time the EXACT default
#    bench invocation the driver runs (SW + bs1 + bs4 + bs8 + bs16accum,
#    no env overrides). Also warms the compile cache for every default leg
#    so the driver's run at round end hits zero cold compiles.
run default_bench_timed bash -c '
  t0=$(date +%s)
  MEDSEG_REQUIRE_TPU=1 python bench.py > /tmp/bench_r5_default_out.json
  rc=$?
  t1=$(date +%s)
  echo "default bench rc=$rc wall=$((t1-t0))s"
  cat /tmp/bench_r5_default_out.json'

echo "=== r5 queue2 complete $(date)"
