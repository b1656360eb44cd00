#!/bin/bash
# Round-5 consolidated queue #4 ("r5d"): everything the interrupted r5
# session left unproduced, in priority order, one PID owning all TPU work.
# The machine restarted since queue #1-#3 ran, so /tmp and the persistent
# compile cache are gone — every leg below pays cold compiles, which makes
# leg 1 (timed default bench) exactly the worst-case "fits in the driver's
# budget" proof VERDICT r4 item 1 asks for.
#
# Start:  setsid nohup bash tools/r5d_queue.sh & echo $! > /tmp/r5d.pid
# Kill:   kill -- -$(cat /tmp/r5d.pid)
set -u
cd "$(dirname "$0")/.."
LOG=tools/ab_logs/r5d_queue.log
exec >>"$LOG" 2>&1

echo "=== r5d queue start $(date)"
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
  local name="$1"; shift
  timeout 2700 "$@"
  echo "=== $name done rc=$? $(date)"
}

SW_ONLY="MEDSEG_BENCH_TRAIN=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=0"
BS1_ONLY="MEDSEG_BENCH_SW=0 MEDSEG_BENCH_TRAIN=1 MEDSEG_BENCH_TRAIN_BS4=0 MEDSEG_BENCH_TRAIN_BS8=0 MEDSEG_BENCH_TRAIN_BS16=0"

# 1. Timed default bench, cold cache — the exact invocation the driver runs
#    at round end (SW + bs1 + bs4 + bs8 + bs16accum, no env overrides).
#    Worst-case budget proof + warms the persistent compile cache.
echo "=== default_bench_timed_cold start $(date)"
t0=$(date +%s)
MEDSEG_REQUIRE_TPU=1 timeout 3600 python bench.py \
  > tools/ab_logs/bench_r5_default_cold.json 2> tools/ab_logs/bench_r5_default_cold.log
rc=$?
t1=$(date +%s)
echo "default bench COLD rc=$rc wall=$((t1-t0))s"
cat tools/ab_logs/bench_r5_default_cold.json

# 2. Zoo train A/B (VERDICT r4 item 6) — per-model so a slow compile only
#    costs its own slot.
for m in GCViTUNETR SegFormer3D FocalNetUNETR SwinUNETR_Official nnFormer; do
  run "zoo_$m" python tools/zoo_train_ab.py "$m" \
    2> "tools/ab_logs/zoo_$m.log"
done

# 3. SW class-major harvest A/B (VERDICT r4 item 4).
ab anchor_sw_r5c_a  $SW_ONLY
ab sw_classmajor    $SW_ONLY MEDSEG_SW_CLASSMAJOR=1
ab anchor_sw_r5c_b  $SW_ONLY
ab sw_classmajor_b  $SW_ONLY MEDSEG_SW_CLASSMAJOR=1

# 4. pad_maximum formulation probe (the SW ledger's identified headroom).
run probe_pad_fusion bash -c \
  'python tools/probe_pad_fusion.py > tools/probe_pad_fusion_r5.txt 2>&1'

# 5. Production-shape validation probe (VERDICT r4 item 7).
run prodshapes bash -c \
  'python tools/val_production_shapes.py > tools/prod_shapes_r5.jsonl 2> tools/ab_logs/prodshapes.log'

# 6. HD95 compile-count probe (VERDICT r4 item 10).
run hd95count bash -c \
  'python tools/hd95_compile_count.py > tools/hd95_compile_count_r5.txt 2>&1'

# 7. bs16 OOM summary line for the train ledger TODO.
run bs16oom_full bash -c \
  'python tools/bs16_oom_probe.py full > tools/ab_logs/bs16oom_full.txt 2>&1'

# 8. ab_r4b recovery legs (fused-loss at bs1 + its anchor).
ab bs1_fusedloss     $BS1_ONLY MEDSEG_FUSED_LOSS=1
ab anchor_bs1_post4b $BS1_ONLY

# 9. Whole-volume SW profile (non-predictor overhead pin).
run sw_fullvol bash -c \
  'python tools/sw_profile.py --full_volume --steps 2 --top 50 > tools/ledger_r5_sw_fullvol.txt 2> tools/ab_logs/sw_fullvol.log'

# 10. Timed default bench, warm cache — the number the driver should see.
echo "=== default_bench_timed_warm start $(date)"
t0=$(date +%s)
MEDSEG_REQUIRE_TPU=1 timeout 3600 python bench.py \
  > tools/ab_logs/bench_r5_default_warm.json 2> tools/ab_logs/bench_r5_default_warm.log
rc=$?
t1=$(date +%s)
echo "default bench WARM rc=$rc wall=$((t1-t0))s"
cat tools/ab_logs/bench_r5_default_warm.json

echo "=== r5d queue ALL complete $(date)"
touch /tmp/r5d.done
