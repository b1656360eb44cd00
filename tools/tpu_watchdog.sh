#!/bin/bash
# Probe the axon TPU tunnel every 10 minutes; when device enumeration
# succeeds, immediately run the round-3 A/B matrix (tools/ab_r3.sh) so the
# hardware measurements land unattended. Leaves markers in /tmp:
#   /tmp/tpu_up            — tunnel responded (timestamp inside)
#   /tmp/tpu_watchdog.log  — probe history
#   tools/ab_r3.jsonl      — the measurements
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_watchdog.log
while true; do
  echo "[$(date +%H:%M:%S)] probing tunnel..." >> "$LOG"
  if timeout 300 python -c "import jax; d=jax.devices(); assert d[0].platform != 'cpu', d; print(d)" >> "$LOG" 2>&1; then
    date > /tmp/tpu_up
    echo "[$(date +%H:%M:%S)] TPU UP — running ab_r3" >> "$LOG"
    bash tools/ab_r3.sh >> "$LOG" 2>&1
    echo "[$(date +%H:%M:%S)] ab_r3 done" >> "$LOG"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] tunnel down; sleeping 600s" >> "$LOG"
  sleep 600
done
